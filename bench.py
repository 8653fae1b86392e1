"""Benchmark runner: EVERY registry query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
    {"metric": "steady_total_sec", "bench_protocol": 2, "value": N,
     "unit": "sec", "queries": {name: sec, ...}, "headline39_sec": M,
     "sf": 0.1}
and writes the same JSON (pretty-printed) to BENCH_LOCAL.json so the
full per-query map survives even if the driver tail-truncates stdout.

All registry queries are timed (HEADLINE order first — stable across
rounds for like-for-like per-query comparison — then the remaining
registry entries in registry order), so a regression in ANY query is
visible in the per-query map. ``headline39_sec`` is the round-4-and-
earlier subtotal over the original HEADLINE list, kept for cross-round
continuity of the old headline number.

Two measurement passes; the per-query map and totals report the MIN
(steady-state plan cost — JIT and host CPU-steal noise excluded), and
``cold_pass_sec``/``cold_headline39_sec`` report the single-shot pass-1
totals for comparability with rounds benched under the old protocol.

Each query is executed with a count()-style action so results stay
distributed (no driver collect cost in the measurement); a warmup pass on
the first query amortizes JVM/codegen startup out of per-query numbers.

A failing query can never improve the headline: any error nulls out
``value`` and the run exits non-zero (the per-query timings and the error
map are still emitted for diagnosis).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q4_order_priority_exists",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_type_profit",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q10_returned_item_ranking",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_distinct_suppliers_not_in",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_pushdown",
    "q20_semi_join_chain",
    "q21_exists_not_exists",
    "q22_anti_join_global_threshold",
    "j3_star_join_revenue",
    "j1_broadcast_lookup_join",
    "j4_anti_join_upload_if_missing",
    "a1_count_by_type",
    "a11_sketch_accuracy",
    "a5_in_group_dedup",
    "a7_windowed_event_counts",
    "w2_first_occurrence_dedup",
    "w3_topk",
    "f3_f4_identity_hash_chain",
    "f12_multiformat_date_parse",
    "f24_claims_melt",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "text_profile",
    "curation_pipeline",
    "domain_page_hash_stats",  # full wikitext import pipeline end-to-end
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from wcdimportbot_spark import get_spark
    from wcdimportbot_spark.plans.benchmark_queries import QUERIES

    spark = get_spark(app_name="wcdimportbot-bench")

    # warmup: trigger JVM/codegen/io paths once outside the measurement
    try:
        QUERIES[HEADLINE[0]].fn(spark, sf_dir).count()
    except Exception as exc:  # noqa: BLE001 - warmup failure must not kill the run
        print(f"# warmup failed: {exc}", file=sys.stderr)

    # One failing query must never abort the run: record the error, keep
    # timing the rest, and always emit the final JSON summary line. But a
    # failing query must also never IMPROVE the run: errors null the
    # headline value and force a non-zero exit.
    #
    # TWO passes, per-query MIN reported. First measurements carry
    # per-query codegen JIT (2-3x on sub-second queries) and this host
    # shows heavy run-to-run CPU steal (SCALE.md "measurement caveat");
    # min-of-2 measures the engine's steady-state plan cost — the
    # quantity that matters at cluster scale, where JIT amortizes. The
    # cold pass-1 total is ALSO emitted (`cold_pass_sec`) so rounds
    # measured under the old single-shot protocol stay comparable.
    order = HEADLINE + [n for n in QUERIES if n not in HEADLINE]
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    # errors are tracked PER PASS: a query that fails in only one pass
    # still fails the run (pass-dependent behavior is itself a bug), but
    # the summary distinguishes "always broken" from "flaky in pass N",
    # and a valid measurement from the other pass is kept in `timings`.
    errors: dict[str, dict[str, str]] = {}
    for pass_no in (1, 2):
        for name in order:
            spec = QUERIES[name]
            # §1.5: label the query's jobs in the UI/event log; set OUTSIDE
            # the timed region (one py4j call)
            spark.sparkContext.setJobDescription(f"bench:{name}:p{pass_no}")
            t0 = time.time()
            try:
                df = spec.fn(spark, sf_dir)
                n = df.count()
                t = round(time.time() - t0, 3)
                if pass_no == 1:
                    cold[name] = t
                timings[name] = min(timings.get(name, t), t)
                print(f"# p{pass_no} {name}: {t}s rows={n}", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001
                msg = f"{type(exc).__name__}: {exc}"[:500]
                errors.setdefault(name, {})[f"pass{pass_no}"] = msg
                print(f"# p{pass_no} {name}: ERROR {msg}", file=sys.stderr)
            # measurements must be independent: several pipeline queries
            # persist their references stage internally; left in place they
            # accumulate across the run and later queries pay their GC bill
            # (and could silently reuse a prior query's cache). The explicit
            # GC drains dropped codegen classes / checkpoint blocks OUTSIDE
            # the next query's measurement — without it, late-order heavy
            # queries absorb the whole session's collection debt (measured
            # ±50% swings on the JIT-heavy pipeline queries).
            spark.catalog.clearCache()
            try:
                spark._jvm.System.gc()
            except Exception:  # noqa: BLE001 - GC nudge is best-effort
                pass

    total = round(sum(timings.values()), 3)
    out = {
        # protocol 2 (round 5+): `value` is the min-of-2 steady-state
        # total; rounds 1-4 benched a single cold pass under the SAME
        # `total_headline_sec` key. The explicit protocol field (and the
        # renamed metric) stops cross-round consumers from comparing the
        # two semantics silently; `cold_pass_sec` is the protocol-1
        # comparable number.
        "metric": "steady_total_sec",
        "bench_protocol": 2,
        "value": None if errors else total,
        "unit": "sec",
        "queries": timings,
        "headline39_sec": round(
            sum(timings.get(n, 0.0) for n in HEADLINE), 3
        ),
        # cold totals are only cross-round comparable when every query
        # produced a pass-1 measurement; emit the count so a partial
        # cold total (a pass-1-only failure) is detectable.
        "cold_pass_sec": round(sum(cold.values()), 3),
        "cold_pass_n_queries": len(cold),
        "cold_headline39_sec": round(
            sum(cold.get(n, 0.0) for n in HEADLINE), 3
        ),
        "passes": 2,
        "n_queries": len(order),
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    # The full JSON (complete names, 3-decimal timings, errors) persists
    # as a repo artifact, diffable across rounds from the repo alone.
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    # trend reads without manual map alignment (r13 verdict Next #6):
    # before overwriting the committed artifact, record the subtotal
    # over the rows COMMON to the previous round's map — new contract
    # rows then stop inflating round-over-round totals in the headline
    # comparison (common_prev_sec this run vs prev_common_sec then).
    try:
        with open(local_path) as fh:
            prev_queries = json.load(fh).get("queries") or {}
    except (OSError, ValueError):
        prev_queries = {}
    if prev_queries:
        common = [n for n in timings if n in prev_queries]
        out["common_prev_n"] = len(common)
        out["common_prev_sec"] = round(
            sum(timings[n] for n in common), 3
        )
        out["prev_common_sec"] = round(
            sum(prev_queries[n] for n in common), 3
        )
    try:
        with open(local_path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"# could not write {local_path}: {exc}", file=sys.stderr)
    # stdout must stay ONE parseable JSON line UNDER the driver's 2000-char
    # tail capture (BENCH_r06 kept only a truncated, unparseable head) —
    # with ~90 registry rows the full-name map cannot fit, so the driver
    # line carries EVERY per-query timing under deterministically
    # shortened keys (longest prefix cap that fits; `key_cap` records it,
    # collisions disambiguated with `~N`; full names in BENCH_LOCAL.json).
    print(json.dumps(_compact_line(out, timings), separators=(",", ":")))
    if errors:
        sys.exit(1)


def _shorten_keys(names: list[str], cap: int) -> dict[str, str]:
    short: dict[str, str] = {}
    used: set[str] = set()
    for n in names:
        s = n[:cap]
        k, i = s, 2
        while k in used:
            k, i = f"{s}~{i}", i + 1
        used.add(k)
        short[n] = k
    return short

def _compact_line(out: dict, timings: dict[str, float]) -> dict:
    # r15 PERF blindness fix: with 129 rows the old line (cap-6 keys,
    # 2-decimal values, cold/common totals in the base) exceeded the 1900
    # budget and fell back to "queries":{} — two rounds of driver-side
    # per-query and scaling comparison were blind. The compact line now
    # carries ONLY the fields the driver needs per run (the cold/common
    # totals live in BENCH_LOCAL.json) and degrades value precision to 1
    # decimal before ever dropping the map. Values are clamped to one
    # least-significant unit so a sub-resolution row reports 0.1/0.01,
    # never 0.0 (a zero would poison the driver's speedup ratios); full
    # 3-decimal timings remain in BENCH_LOCAL.json.
    base = {
        k: out[k]
        for k in (
            "metric", "bench_protocol", "value", "unit", "sf", "n_queries",
            "headline39_sec",
        )
        if k in out
    }
    if out.get("errors"):
        base["n_errors"] = len(out["errors"])
    for cap, nd in (
        (99, 2), (14, 2), (12, 2), (10, 2), (8, 2), (6, 2),
        (8, 1), (7, 1), (6, 1), (5, 1),
    ):
        smap = _shorten_keys(list(timings), cap)
        compact = dict(
            base,
            key_cap=cap,
            queries={
                smap[n]: max(round(v, nd), 10 ** -nd)
                for n, v in timings.items()
            },
        )
        if len(json.dumps(compact, separators=(",", ":"))) <= 1950:
            return compact
    compact["queries"] = {}  # last resort: totals always fit
    return compact


if __name__ == "__main__":
    main()
