"""CLI entry point with the reference's command surface
(``wcdimportbot.py`` / ``src/__init__.py:57-137,323-352``), driving the
Spark pipelines against a local store directory of parquet tables
(items/claims/cache/rejects).

    python -m wcdimportbot_spark.cli --store /tmp/wcd --import-title "Easter Island"
    python -m wcdimportbot_spark.cli --store /tmp/wcd --import-pages dump.parquet
    python -m wcdimportbot_spark.cli --store /tmp/wcd --max-range 5 --pages dump.parquet
    python -m wcdimportbot_spark.cli --store /tmp/wcd --category "World War II" \
        --category-links links.parquet --pages dump.parquet
    python -m wcdimportbot_spark.cli --store /tmp/wcd --lookup-md5hash e98adc...
    python -m wcdimportbot_spark.cli --store /tmp/wcd --statistics
    python -m wcdimportbot_spark.cli --store /tmp/wcd --rinse
    python -m wcdimportbot_spark.cli --store /tmp/wcd --delete-page "Easter Island"
    python -m wcdimportbot_spark.cli --store /tmp/wcd \
        --bpe-train docs.parquet --bpe-store /tmp/tok --bpe-merges 64
    python -m wcdimportbot_spark.cli --store /tmp/wcd \
        --bpe-encode docs.parquet --bpe-store /tmp/tok --encode-out enc/

Differences from the reference, by design: the sink is the local graph
store (not a live Wikibase); ``--import-title`` fetches over MediaWiki REST
only when ``requests`` is importable and ``--live`` is passed, else uses
the deterministic offline stub (sources/pages.py); batch imports read page
dumps instead of crawling.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F


def _read_or_none(spark, path):
    from wcdimportbot_spark.operators.sinks import has_parquet_data, read_snapshot

    # data-file check, not exists(): a directory holding only _SUCCESS
    # (0-row write) must read as "no store", not a schema-inference error
    if has_parquet_data(path):
        return read_snapshot(spark, path)
    return None


def _import_pages(spark, pages, paths) -> None:
    """Incremental MERGE of one import batch into the store (shared with
    the streaming sink — plans/store_import.py): only the hash buckets the
    batch touches are rewritten; a re-import writes nothing."""
    from wcdimportbot_spark.plans.store_import import import_pages_to_store

    n_pages, n_new = import_pages_to_store(spark, pages, paths)
    print(f"imported: {n_pages} pages, {n_new} new items")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="wcdimportbot-spark",
        description="PySpark-native WCD import bot (reference command surface)",
    )
    parser.add_argument("--store", required=True, help="graph store directory (parquet tables)")
    parser.add_argument("-i", "--import-title", help="import one page by title")
    parser.add_argument("--import-pages", help="import a page dump (parquet)")
    parser.add_argument("--pages", help="page dump for --max-range/--category")
    parser.add_argument("-c", "--category", help="import pages in a category, recursively")
    parser.add_argument("--category-links", help="category_links(parent, child) parquet")
    parser.add_argument("--page-categories", help="page_categories(page_id, category) parquet")
    parser.add_argument("-r", "--max-range", type=int, help="import max range of pages")
    parser.add_argument(
        "--import-events",
        help="consume a JSON event-stream directory into the store "
        "(the reference's event_stream consumer; file source, one JSON "
        "event per line)",
    )
    parser.add_argument(
        "--max-events",
        type=int,
        help="cap the event stream at this many events (counted post-filter/"
        "dedup, like the reference's consumer — event_stream.py:67-75)",
    )
    parser.add_argument("-l", "--lookup-md5hash", help="lookup a hash in cache and claims")
    parser.add_argument("-d", "--delete-page", help="delete one page item by title")
    parser.add_argument("--rinse", action="store_true", help="delete all items and flush the cache")
    parser.add_argument("-s", "--statistics", action="store_true", help="print graph statistics")
    parser.add_argument(
        "--verify-store",
        action="store_true",
        help="check the cross-store commit manifest: detects an import "
        "crashed between the items/claims/cache publishes (status "
        "'ahead' — replay the batch to converge)",
    )
    parser.add_argument(
        "--split-bucket",
        type=int,
        help="split one hot hash bucket into two children (extendible "
        "hashing; cost linear in that bucket, every other dir hardlinks "
        "through)",
    )
    parser.add_argument(
        "--split-table",
        choices=("items", "claims", "cache", "dedup-hashes", "dedup-bands",
                 "corpus"),
        default="items",
        help="which store table --split-bucket operates on; dedup-* grow "
        "the dedup index's fanout (needs --dedup-index) and 'corpus' the "
        "curated corpus store's (needs --curation-store) — the lever "
        "that keeps a k-hash purge's write fraction at min(k,B)/B as a "
        "store grows",
    )
    parser.add_argument(
        "--compact",
        action="store_true",
        help="compact multi-file store partitions into one sorted file "
        "each (MERGE-store maintenance, published as a new snapshot)",
    )
    parser.add_argument(
        "--expire-history",
        metavar="TABLE_DIR",
        nargs="+",
        help="force-expire every retained snapshot behind the current "
        "one of the given store table dirs (Delta VACUUM sans "
        "retention check) — the standalone lever for scrubbing "
        "history after ad-hoc deletes (--delete-page, --ann-delete, "
        "--dedup-delete); the composed purge has it as --purge-vacuum",
    )
    parser.add_argument(
        "--sketch-store",
        metavar="DIR",
        help="windowed distinct-sketch store directory (for --sketch-prune)",
    )
    parser.add_argument(
        "--ann-store",
        metavar="DIR",
        help="maintained ANN index store directory — with --compact, its "
        "codes store is folded alongside the graph stores; target of the "
        "--ann-build/--ann-add/--ann-probe/--ann-retrain lifecycle",
    )
    parser.add_argument(
        "--ann-build",
        metavar="EMB",
        help="build the IVFPQ index from an embeddings parquet into "
        "--ann-store (full rewrite, new snapshot versions)",
    )
    parser.add_argument(
        "--ann-add",
        metavar="EMB",
        help="incrementally add an embeddings parquet to --ann-store "
        "under the frozen model (idempotent insert-if-absent; the "
        "production ingest loop)",
    )
    parser.add_argument(
        "--ann-probe",
        metavar="EMB",
        help="serve top-k neighbors for the first --num-queries vectors "
        "of an embeddings parquet from the stored index; prints JSON "
        "rows",
    )
    parser.add_argument(
        "--ann-retrain",
        metavar="EMB",
        help="rebuild --ann-store from an embeddings parquet under the "
        "stored hyperparameters (the staleness-contract retrain; "
        "concurrent probes keep serving the superseded snapshots)",
    )
    parser.add_argument(
        "--ann-delete",
        metavar="IDS",
        help="propagate document deletes into --ann-store: remove the "
        "vec_id rows of an ids parquet from the codes store via the "
        "pruned copy-on-write delete (absent ids are swallowed); "
        "deletes raise drift_ratio toward the retrain trigger",
    )
    parser.add_argument(
        "--ann-upsert",
        metavar="VECS",
        help="re-crawl refresh into --ann-store: matched vec_ids are "
        "REPLACED (pruned delete + re-encode under the current model; "
        "a changed vector moves to its new cluster), absent ids "
        "insert — plain --ann-add is insert-if-absent and would "
        "duplicate a changed vector beside its stale row",
    )
    parser.add_argument(
        "--topk", type=int, default=5, help="with --ann-probe: neighbors per query"
    )
    parser.add_argument(
        "--num-queries", type=int, default=10,
        help="with --ann-probe: how many leading vectors to use as queries",
    )
    parser.add_argument(
        "--sketch-prune",
        metavar="CUTOFF",
        help="fold windows with window_start older than CUTOFF "
        "(e.g. '2024-03-01') of --sketch-store into the lifetime sketch "
        "row — window-age retention for the streaming sketch gate",
    )
    parser.add_argument("--live", action="store_true", help="fetch titles over MediaWiki REST")
    parser.add_argument(
        "--curate",
        metavar="DOCS",
        help="print a JSON curation report over a documents parquet "
        "(profile, exact/near dups, heavy n-grams)",
    )
    parser.add_argument(
        "--eval-docs",
        metavar="DOCS",
        help="with --curate: benchmark parquet for n-gram decontamination",
    )
    parser.add_argument(
        "--token-budget",
        type=int,
        help="with --curate: per-language token budget for the mixture sample",
    )
    parser.add_argument(
        "--write-shards",
        metavar="OUT",
        help="with --curate: materialize the corpus as training shards "
        "(split=/shard= parquet layout, epoch order; see --epoch)",
    )
    parser.add_argument(
        "--epoch", type=int, default=0, help="epoch for --write-shards ordering"
    )
    parser.add_argument(
        "--dedup-ingest",
        metavar="DOCS",
        help="probe a documents parquet against the persistent dedup "
        "index, append the fresh survivors to it, and print a JSON "
        "summary (the production probe → filter → append loop)",
    )
    parser.add_argument(
        "--dedup-index",
        metavar="DIR",
        help="with --dedup-ingest: index store directory (created on "
        "first ingest)",
    )
    parser.add_argument(
        "--fresh-out",
        metavar="DIR",
        help="with --dedup-ingest: also write the fresh documents as "
        "parquet here (append)",
    )
    parser.add_argument(
        "--dedup-delete",
        metavar="HASHES",
        help="with --dedup-index: make the index FORGET a text_hash "
        "parquet's content (exact hashes + band fingerprints leave via "
        "the pruned copy-on-write delete; absent hashes swallowed)",
    )
    parser.add_argument(
        "--curation-store",
        metavar="DIR",
        help="nightly-curation store root (corpus + dedup index) for "
        "--curate-increment/--curate-refresh/--purge-docs",
    )
    parser.add_argument(
        "--curate-increment",
        metavar="DOCS",
        help="run ONE nightly curation increment of a documents parquet "
        "against --curation-store (probe -> quality gate -> corpus "
        "merge -> index merge); prints a JSON summary",
    )
    parser.add_argument(
        "--curate-refresh",
        metavar="DOCS",
        help="re-crawl refresh increment: re-sent doc_ids with CHANGED "
        "text replace their old corpus rows and swap their index "
        "fingerprints before the standard increment runs",
    )
    parser.add_argument(
        "--purge-docs",
        metavar="IDS",
        help="composed purge from --curation-store: a parquet of doc_id "
        "(or text_hash) rows leaves the corpus AND the dedup index "
        "under one two-phase marker; purged content may re-enter on "
        "the next crawl",
    )
    parser.add_argument(
        "--purge-item-hashes",
        metavar="HASHES",
        help="with --purge-docs: a parquet of hash (optionally "
        "subject_qid) rows naming the graph items the doomed docs "
        "produced; the purge then also prunes them from --store's "
        "items, claims, and cache tables (the reference's delete + "
        "cache-flush contract, crud/delete.py:44-61)",
    )
    parser.add_argument(
        "--purge-status",
        action="store_true",
        help="print --curation-store's purge marker as JSON: 'pending' "
        "means a purge is running or crashed mid-window — replay it "
        "with its original inputs (the marker records the input digest "
        "and every resolution the crashed attempt derived)",
    )
    parser.add_argument(
        "--purge-ann-ids",
        metavar="IDS",
        help="with --purge-docs: a parquet of vec_id (optionally "
        "cluster) rows naming the doomed docs' vectors; the purge then "
        "also prunes them from --ann-store's codes store (the ANN arm "
        "of the composed purge)",
    )
    parser.add_argument(
        "--purge-outputs",
        metavar="DIR",
        nargs="+",
        help="with --purge-docs: batch_id-partitioned gate output "
        "dirs (fresh_out / rejects) to scrub too — only partitions "
        "holding doomed rows are rewritten; an all-doomed batch dir "
        "is removed",
    )
    parser.add_argument(
        "--purge-shards",
        metavar="DIR",
        nargs="+",
        help="with --purge-docs (doc_id form): split=/shard= training "
        "layouts (write_training_shards) to scrub — touched partitions "
        "are named closed-form from the doomed keys, survivors keep "
        "their epoch pos values",
    )
    parser.add_argument(
        "--purge-epoch",
        type=int,
        default=0,
        help="with --purge-shards: fallback epoch for layouts predating "
        "the _SHARDS.json sidecar (the sidecar's recorded epoch wins)",
    )
    parser.add_argument(
        "--purge-vacuum",
        action="store_true",
        help="with --purge-docs: also force-expire every touched "
        "store's retained history (Delta VACUUM sans retention check) "
        "— without it the purged rows stay readable via time travel "
        "and on disk until age-based pruning; required for a "
        "GDPR-complete scrub",
    )
    parser.add_argument(
        "--bind-ann",
        metavar="KEY",
        nargs="?",
        const="doc_id",
        help="bind --ann-store to --curation-store's corpus keyed by "
        "KEY (default doc_id): every later --purge-docs then derives "
        "the doomed vec_ids ITSELF and prunes the ANN codes store with "
        "no --purge-ann-ids argument — the binding closes the "
        "forgotten-arm hazard, and the marker records the resolution "
        "for crash replay",
    )
    parser.add_argument(
        "--heal-scrub",
        metavar="DIR",
        nargs="+",
        help="maintenance lever: full-tree convergence of crashed "
        "scrub state on plain layouts (gate outputs / training shards) "
        "— restores or discards hidden .__doomed_* trash twins at any "
        "depth and clears a stale _SCRUB_PENDING sentinel, after which "
        "guarded readers accept the layout again (per-scrub heals are "
        "scoped to the partitions that scrub targets; this walks "
        "everything)",
    )
    parser.add_argument(
        "--expire-outputs",
        metavar="DIR",
        nargs="+",
        help="retention for batch_id=-partitioned gate-output dirs "
        "(they grow one partition per micro-batch forever): the newest "
        "--keep-last partitions are a protection floor (never "
        "expired); --keep-last alone drops everything below the "
        "floor, --older-than alone rotates by age, and together the "
        "age rule governs below the floor. Pass --curation-store to "
        "also refuse while that store's purge marker is pending. "
        "Removal renames each doomed dir to a "
        "hidden .__expired_* twin first (atomic disappearance from "
        "partition discovery), so racing readers never see a "
        "half-deleted partition",
    )
    parser.add_argument(
        "--keep-last",
        type=int,
        help="with --expire-outputs: newest N partitions to keep",
    )
    parser.add_argument(
        "--older-than",
        type=float,
        help="with --expire-outputs/--rotate-rejects: age threshold "
        "in seconds",
    )
    parser.add_argument(
        "--rotate-rejects",
        action="store_true",
        help="rotate the graph store's rejects side-output (the "
        "reference's per-rule *.log files as parquet): remove data "
        "files older than --older-than seconds; empty rule dirs are "
        "removed",
    )
    parser.add_argument(
        "--bpe-train",
        metavar="DOCS",
        help="train a BPE merge table on a documents parquet and "
        "publish it as a new snapshot version of the tokenizer store "
        "(--bpe-store); prints a JSON summary",
    )
    parser.add_argument(
        "--bpe-encode",
        metavar="DOCS",
        help="encode a documents parquet under the stored tokenizer "
        "(--bpe-store, CURRENT version) and print a JSON "
        "fertility/compression summary",
    )
    parser.add_argument(
        "--bpe-store",
        metavar="DIR",
        help="tokenizer store directory for --bpe-train/--bpe-encode",
    )
    parser.add_argument(
        "--bpe-merges",
        type=int,
        default=32,
        help="number of merges for --bpe-train (default 32)",
    )
    parser.add_argument(
        "--encode-out",
        metavar="DIR",
        help="with --bpe-encode: also write the per-doc token stats as "
        "parquet here (append)",
    )
    args = parser.parse_args(argv)

    if args.purge_status:
        # pure driver-side marker read — the remediation probe for a
        # possibly-wedged purge must not wait out SparkSession startup
        if not args.curation_store:
            parser.error("--purge-status needs --curation-store <dir>")
        from wcdimportbot_spark.plans.curation_nightly import purge_state

        print(json.dumps(purge_state(args.curation_store), sort_keys=True))
        return 0

    if args.heal_scrub:
        # pure driver-side rename walk — no SparkSession needed
        from wcdimportbot_spark.operators.sinks import heal_plain_layout

        for d in args.heal_scrub:
            heal_plain_layout(d)
            print(json.dumps({"healed": d}))
        return 0

    if args.expire_outputs:
        # pure driver-side retention — no SparkSession needed
        if args.keep_last is None and args.older_than is None:
            parser.error(
                "--expire-outputs needs --keep-last and/or --older-than"
            )
        from wcdimportbot_spark.operators.sinks import (
            expire_plain_partitions,
        )

        for d in args.expire_outputs:
            res = expire_plain_partitions(
                d,
                keep_last=args.keep_last,
                older_than_secs=args.older_than,
                owner_base=args.curation_store,
            )
            print(json.dumps({"dir": d, **res}, sort_keys=True))
        return 0

    if args.rotate_rejects:
        if args.older_than is None:
            parser.error("--rotate-rejects needs --older-than SECONDS")
        from wcdimportbot_spark.operators.sinks import rotate_reject_logs
        from wcdimportbot_spark.plans.store_import import store_paths as _sp

        res = rotate_reject_logs(
            _sp(args.store)["rejects"],
            args.older_than,
            owner_base=args.curation_store,
        )
        print(json.dumps(res, sort_keys=True))
        return 0

    from wcdimportbot_spark import get_spark

    spark = get_spark(app_name="wcdimportbot-cli")
    from wcdimportbot_spark.plans.store_import import store_paths

    paths = store_paths(args.store)

    if args.import_title:
        from wcdimportbot_spark.sources.pages import fetch_pages_by_title

        titles = spark.createDataFrame([(args.import_title,)], ["title"])
        pages = fetch_pages_by_title(titles, live=args.live)
        _import_pages(spark, pages, paths)

    elif args.import_pages or args.max_range or args.category:
        from wcdimportbot_spark.sources.pages import range_scan, read_page_dump

        dump = args.import_pages or args.pages
        if not dump:
            parser.error("--max-range/--category need --pages <dump.parquet>")
        pages = read_page_dump(spark, dump)
        if args.category:
            if not (args.category_links and args.page_categories):
                parser.error("--category needs --category-links and --page-categories")
            from wcdimportbot_spark.sources.category import (
                articles_in_category,
                category_closure,
            )

            links = spark.read.parquet(args.category_links)
            page_cats = spark.read.parquet(args.page_categories)
            roots = spark.createDataFrame([(args.category,)], ["category"])
            closure = category_closure(links, roots)
            pages = articles_in_category(closure, pages, page_cats).drop("root")
        if args.max_range:
            pages = range_scan(pages, max_count=args.max_range)
        _import_pages(spark, pages, paths)

    elif args.import_events:
        from wcdimportbot_spark.plans.store_import import store_import_batch_fn
        from wcdimportbot_spark.streaming.events import (
            StreamCounters,
            parse_event_stream,
            run_event_stream,
        )

        if args.max_events == 0:
            # a zero cap means "process nothing" — don't start a stream
            # that would race its own immediate stop
            print("stream: 0 events in 0 batches")
            return 0
        raw = spark.readStream.format("text").load(args.import_events)
        counters = StreamCounters(max_events=args.max_events)
        query = run_event_stream(
            parse_event_stream(raw),
            store_import_batch_fn(args.store),
            counters,
            checkpoint_dir=os.path.join(args.store, "_checkpoint"),
        )
        # drain what is currently available, capped by --max-events: the
        # monitor thread stops the query mid-drain when the cap is hit,
        # which surfaces here as the drain call ending early. A directory
        # with fewer events than the cap still exits after the drain — the
        # cap is a ceiling, not a wait target (a long-running daemon would
        # awaitTermination() instead).
        try:
            query.processAllAvailable()
        except Exception:
            # a query the monitor stopped at the cap is inactive with NO
            # exception; a query killed by a foreachBatch error is ALSO
            # inactive — distinguish on query.exception(), not isActive,
            # or real stream failures exit 0
            if query.isActive or query.exception() is not None:
                raise
        if query.isActive:
            query.stop()
        elif query.exception() is not None:
            raise query.exception()
        print(
            f"stream: {counters.events} events in {counters.batches} batches"
        )

    elif args.lookup_md5hash:
        from wcdimportbot_spark.operators import cache as cache_ops
        from wcdimportbot_spark.operators.analytics import lookup_qids_for_hash

        cache = cache_ops.read_cache(spark, paths["cache"])
        hits = cache_ops.lookup(cache, args.lookup_md5hash).collect()
        print(f"cache: {[r['qid'] for r in hits]}")
        claims = _read_or_none(spark, paths["claims"])
        if claims is not None:
            qids = lookup_qids_for_hash(claims, args.lookup_md5hash).collect()
            print(f"claims: {[r['subject_qid'] for r in qids]}")

    elif args.split_bucket is not None:
        from wcdimportbot_spark.operators import sinks as sinks_ops

        layouts = {
            "items": ("hash", ["instance_of", sinks_ops.BUCKET_COL]),
            "claims": ("subject_qid", ["property", sinks_ops.BUCKET_COL]),
            "cache": ("hash", [sinks_ops.BUCKET_COL]),
            "dedup-hashes": ("text_hash", [sinks_ops.BUCKET_COL]),
            "dedup-bands": ("bk", [sinks_ops.BUCKET_COL]),
            "corpus": ("text_hash", [sinks_ops.BUCKET_COL]),
        }
        key, parts = layouts[args.split_table]
        if args.split_table.startswith("dedup-"):
            if not args.dedup_index:
                parser.error(
                    "--split-table dedup-* needs --dedup-index <dir>"
                )
            target = os.path.join(
                args.dedup_index, args.split_table.removeprefix("dedup-")
            )
        elif args.split_table == "corpus":
            if not args.curation_store:
                parser.error(
                    "--split-table corpus needs --curation-store <dir>"
                )
            from wcdimportbot_spark.plans.curation_nightly import _corpus_path

            target = _corpus_path(args.curation_store)
        else:
            target = paths[args.split_table]
        info = sinks_ops.split_bucket(
            spark, target, args.split_bucket, key=key, partitions=parts,
        )
        print(json.dumps(info, sort_keys=True))

    elif args.verify_store:
        from wcdimportbot_spark.plans.store_import import (
            verify_import_consistency,
        )

        report = verify_import_consistency(args.store)
        print(json.dumps(report, indent=2, sort_keys=True))
        return 0 if report["status"] in ("consistent", "no-manifest") else 1

    elif args.compact:
        from wcdimportbot_spark.operators.sinks import (
            compact_cache,
            compact_claims,
            compact_items,
        )

        out = {}
        for name, fn in (
            ("items", compact_items),
            ("claims", compact_claims),
            ("cache", compact_cache),
        ):
            out[name] = fn(spark, paths[name])
        if args.dedup_index:
            from wcdimportbot_spark.operators.text_dedup import (
                compact_dedup_index,
            )

            out["dedup_index"] = compact_dedup_index(spark, args.dedup_index)
        if args.ann_store:
            from wcdimportbot_spark.operators.ann_store import (
                compact_ann_codes,
            )

            out["ann_codes"] = compact_ann_codes(spark, args.ann_store)
        print(json.dumps(out, sort_keys=True))

    elif args.expire_history:
        from wcdimportbot_spark.operators import versioned

        out = {
            d: len(versioned.expire_history(d)) for d in args.expire_history
        }
        print(json.dumps(out, sort_keys=True))

    elif args.sketch_prune:
        if not args.sketch_store:
            parser.error("--sketch-prune needs --sketch-store <dir>")
        from wcdimportbot_spark.streaming.sketch_gate import (
            prune_windowed_sketches,
        )

        print(
            json.dumps(
                prune_windowed_sketches(
                    spark, args.sketch_store, args.sketch_prune
                ),
                sort_keys=True,
            )
        )

    elif args.statistics:
        from wcdimportbot_spark.operators.analytics import (
            count_items_by_type,
            count_property_usage,
        )

        items = _read_or_none(spark, paths["items"])
        claims = _read_or_none(spark, paths["claims"])
        stats = {"items": {}, "properties": {}}
        if items is not None:
            stats["items"] = {
                r["instance_of"]: r["count"] for r in count_items_by_type(items).collect()
            }
        if claims is not None:
            stats["properties"] = {
                r["property"]: r["items_with_property"]
                for r in count_property_usage(claims).collect()
            }
        print(json.dumps(stats, indent=2, sort_keys=True))

    elif args.rinse:
        import shutil

        # include the streaming checkpoint: a surviving checkpoint would
        # make a post-rinse --import-events of the same directory a silent
        # no-op (source files already marked processed)
        doomed_paths = list(paths.values()) + [
            os.path.join(args.store, "_checkpoint")
        ]
        # the wholesale wipe is a cross-store delete like any other: an
        # import straddling it could re-merge cache rows after the wipe
        # removed their items (the P12-forever state) — run under the
        # shared import-race bracket (r14), which re-wipes if an
        # import's merges landed inside the window (the epoch sidecars
        # live at the store root, outside the wiped subdirs)
        from wcdimportbot_spark.plans.store_import import (
            run_deletes_with_import_repair,
        )

        def _rinse():
            removed = 0
            for p in doomed_paths:
                if os.path.exists(p):
                    shutil.rmtree(p)
                    removed += 1
            return (removed,)

        run_deletes_with_import_repair(args.store, _rinse)
        print("rinsed: all items, claims, cache, rejects")

    elif args.delete_page:
        from wcdimportbot_spark.functions.columns import shorten

        items = _read_or_none(spark, paths["items"])
        claims = _read_or_none(spark, paths["claims"])
        if items is None:
            print("store is empty")
            return 1
        # page qid is deterministic from (title, language, page_id); the CLI
        # only knows the title, so match by label — but stored labels are
        # shortened to 250 chars (graph.page_items), so apply the SAME
        # truncation to the requested title or >250-char pages could never
        # be deleted. The store may hold several language editions; all are
        # deleted, like the reference's per-title delete.
        doomed = (
            items.filter(
                (F.col("instance_of") == "WIKIPEDIA_PAGE")
                & (F.col("label") == shorten(F.lit(args.delete_page), 250))
            )
            .select("qid", "hash")
            # materialize: reused by three pruned deletes, each of which
            # replaces the snapshot the plan would otherwise re-read
            .localCheckpoint(eager=True)
        )
        from wcdimportbot_spark.operators import cache as cache_ops
        from wcdimportbot_spark.operators import sinks

        # pruned copy-on-write deletes (r10 verdict #1): untouched bucket
        # dirs survive as hardlinks in the new snapshot; only buckets
        # actually holding the doomed page are rewritten. Deleting an
        # already-deleted page is swallowed (n == 0), the reference's
        # tolerant delete (crud/delete.py:44-61). The three deletes run
        # under the shared import-race bracket (r14): a delete whose
        # window straddles a concurrent import's merges would otherwise
        # leave cache-present/items-absent — the P12 probe then skips
        # every re-import of that page forever.
        from wcdimportbot_spark.plans.store_import import (
            run_deletes_with_import_repair,
        )

        def _page_deletes():
            ni = sinks.merge_delete_items(
                spark, doomed.select("hash"), paths["items"]
            )
            if claims is not None:
                sinks.merge_delete_claims(
                    spark,
                    doomed.select(F.col("qid").alias("subject_qid")),
                    paths["claims"],
                )
            # the reference also deletes the page hash from the cache
            # (src/__init__.py:181); without this the import path's P12
            # already-uploaded anti-join sees the stale hash and a
            # deleted page can never be re-imported ("0 new items"
            # forever). Unconditional on the repair path: a re-run
            # whose items delete found nothing may still need to clear
            # cache rows an interleaved import just re-merged.
            nk = 0
            if sinks.has_parquet_data(paths["cache"]):
                nk = cache_ops.merge_delete_cache(
                    spark, doomed.select("hash"), paths["cache"]
                )
            return ni, nk

        n, _nk = run_deletes_with_import_repair(args.store, _page_deletes)
        print(f"deleted {n} page item(s) titled {args.delete_page!r}")

    elif args.dedup_ingest:
        # NOTE: F and json are module-level imports — re-importing them
        # here would make the names function-local for EVERY branch of
        # main() (UnboundLocalError in the others)
        if not args.dedup_index:
            parser.error("--dedup-ingest needs --dedup-index <dir>")
        from wcdimportbot_spark.operators.text_dedup import dedup_index_ingest

        docs = spark.read.parquet(args.dedup_ingest)
        ann = dedup_index_ingest(docs, args.dedup_index)
        summary = ann.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("fresh").cast("int")).alias("n_fresh"),
            F.sum(F.col("exact_dup_of_history").cast("int")).alias("n_exact_dup"),
            F.sum(F.col("near_dup_of_history").cast("int")).alias("n_near_dup"),
        ).first()
        if args.fresh_out:
            fresh = docs.join(
                ann.filter(F.col("fresh")).select("doc_id"), "doc_id", "left_semi"
            )
            fresh.write.mode("append").parquet(args.fresh_out)
        print(
            json.dumps(
                {
                    "n_docs": summary["n_docs"],
                    "n_fresh": summary["n_fresh"] or 0,
                    "n_exact_dup": summary["n_exact_dup"] or 0,
                    "n_near_dup": summary["n_near_dup"] or 0,
                    "index": args.dedup_index,
                }
            )
        )

    elif args.dedup_delete:
        if not args.dedup_index:
            parser.error("--dedup-delete needs --dedup-index <dir>")
        from wcdimportbot_spark.operators.text_dedup import dedup_index_delete

        res = dedup_index_delete(
            spark.read.parquet(args.dedup_delete), args.dedup_index
        )
        print(json.dumps({**res, "index": args.dedup_index}))

    elif args.curate_increment or args.curate_refresh or args.purge_docs:
        if not args.curation_store:
            parser.error(
                "the nightly-curation ops need --curation-store <dir>"
            )
        from wcdimportbot_spark.plans import curation_nightly as cn

        if args.purge_docs:
            graph_kw = {}
            if args.purge_item_hashes:
                graph_kw = {
                    "graph_store": args.store,
                    "item_hashes": spark.read.parquet(args.purge_item_hashes),
                }
            if args.purge_ann_ids:
                if not args.ann_store:
                    parser.error("--purge-ann-ids needs --ann-store <dir>")
                graph_kw.update(
                    ann_path=args.ann_store,
                    ann_vec_ids=spark.read.parquet(args.purge_ann_ids),
                )
            doomed_df = spark.read.parquet(args.purge_docs)
            res = cn.purge_documents(
                spark,
                doomed_df,
                args.curation_store,
                output_dirs=args.purge_outputs,
                vacuum=args.purge_vacuum,
                **graph_kw,
            )
            if args.purge_shards:
                if "doc_id" not in doomed_df.columns:
                    parser.error(
                        "--purge-shards needs the --purge-docs parquet "
                        "in doc_id form (shards key on doc identity, "
                        "not content hash)"
                    )
                from wcdimportbot_spark.operators.training_prep import (
                    purge_training_shards,
                )

                res["shards_deleted"] = sum(
                    purge_training_shards(
                        doomed_df, d, epoch=args.purge_epoch
                    )["rows_deleted"]
                    for d in args.purge_shards
                )
            print(json.dumps({**res, "state": cn.purge_state(
                args.curation_store)["status"]}))
        else:
            docs = spark.read.parquet(
                args.curate_increment or args.curate_refresh
            )
            if args.curate_refresh:
                ann = cn.curate_refresh(docs, args.curation_store)
            else:
                ann = cn.curate_increment(docs, args.curation_store)
            agg = [
                F.count("*").alias("n_docs"),
                F.sum(F.col("kept").cast("int")).alias("n_kept"),
                F.sum(F.col("dup_of_history").cast("int")).alias("n_dup"),
                F.sum(F.col("low_quality").cast("int")).alias("n_low_q"),
            ]
            if "refreshed" in ann.columns:
                agg.append(
                    F.sum(F.col("refreshed").cast("int")).alias("n_refreshed")
                )
            row = ann.agg(*agg).first()
            print(json.dumps({k: int(row[k] or 0) for k in row.asDict()}))

    elif args.bind_ann:
        if not (args.curation_store and args.ann_store):
            parser.error(
                "--bind-ann needs --curation-store and --ann-store"
            )
        from wcdimportbot_spark.plans import curation_nightly as cn

        cn.bind_ann_store(
            args.curation_store, args.ann_store, key=args.bind_ann
        )
        print(
            json.dumps(
                {"bound": args.ann_store, "key": args.bind_ann}
            )
        )

    elif (args.ann_build or args.ann_add or args.ann_probe
          or args.ann_retrain or args.ann_delete or args.ann_upsert):
        if not args.ann_store:
            parser.error("the --ann-* lifecycle needs --ann-store <dir>")
        from wcdimportbot_spark.operators import ann_store as ann

        if args.ann_build:
            stats = ann.ann_index_build(
                spark.read.parquet(args.ann_build), args.ann_store
            )
            print(json.dumps({k: stats[k] for k in ("n_built", "model_version",
                                                    "num_clusters", "m", "n_codes")}))
        elif args.ann_add:
            res = ann.ann_index_add_batch(
                spark.read.parquet(args.ann_add), args.ann_store
            )
            print(json.dumps(res))
        elif args.ann_retrain:
            stats = ann.ann_retrain(
                spark.read.parquet(args.ann_retrain), args.ann_store
            )
            print(json.dumps({k: stats[k] for k in ("n_built", "model_version",
                                                    "retrained_from")}))
        elif args.ann_upsert:
            res = ann.ann_index_upsert(
                spark.read.parquet(args.ann_upsert), args.ann_store
            )
            print(json.dumps(res))
        elif args.ann_delete:
            n = ann.ann_index_delete(
                spark.read.parquet(args.ann_delete), args.ann_store
            )
            drift = ann.ann_index_stats(spark, args.ann_store).select(
                "drift_ratio"
            ).first()
            print(json.dumps({
                "deleted": int(n),
                "drift_ratio": float(drift["drift_ratio"]) if drift else None,
            }))
        else:
            rows = ann.ann_index_probe(
                spark.read.parquet(args.ann_probe),
                args.ann_store,
                num_queries=args.num_queries,
                k=args.topk,
            ).collect()
            for r in rows:
                print(json.dumps({
                    "query_id": r["query_id"],
                    "neighbor_id": r["neighbor_id"],
                    "cosine": r["cosine"],
                    "rank": r["rank"],
                }))

    elif args.bpe_train or args.bpe_encode:
        from wcdimportbot_spark.operators.bpe import (
            bpe_encode_profile,
            load_merges,
            save_merges,
            train_merges,
        )

        if not args.bpe_store:
            parser.error("--bpe-train/--bpe-encode need --bpe-store <dir>")
        if args.bpe_train:
            merges = train_merges(
                spark.read.parquet(args.bpe_train),
                num_merges=args.bpe_merges,
            )
            version = save_merges(spark, merges, args.bpe_store)
            print(
                json.dumps(
                    {
                        "trained_merges": len(merges),
                        "version": version,
                        "store": args.bpe_store,
                    }
                )
            )
        if args.bpe_encode:
            merges = load_merges(spark, args.bpe_store)
            prof = bpe_encode_profile(
                spark.read.parquet(args.bpe_encode), merges=merges
            )
            if args.encode_out:
                prof.write.mode("append").parquet(args.encode_out)
            s = prof.agg(
                F.count("*").alias("n_docs"),
                F.sum("n_bpe_tokens").alias("total_tokens"),
                F.avg("tokens_per_word").alias("mean_tokens_per_word"),
            ).first()
            print(
                json.dumps(
                    {
                        "n_docs": s["n_docs"],
                        "total_tokens": s["total_tokens"],
                        "mean_tokens_per_word": round(
                            s["mean_tokens_per_word"], 4
                        )
                        if s["mean_tokens_per_word"] is not None
                        else None,
                        "merges": len(merges),
                    }
                )
            )

    elif args.curate:
        from wcdimportbot_spark.operators.curation import (
            decontaminate,
            duplicate_clusters,
            heavy_ngrams,
            mixture_sample,
        )
        from wcdimportbot_spark.operators.text_analysis import document_profile
        from wcdimportbot_spark.operators.text_dedup import (
            exact_duplicate_groups,
            ngram_jaccard_pairs,
        )

        docs = spark.read.parquet(args.curate)
        # every section below is an aggregate — the driver only ever sees
        # per-language / per-cluster summaries, never document rows
        prof = (
            document_profile(docs)
            .groupBy("detected_lang")
            .agg(
                F.count("*").alias("docs"),
                F.round(F.avg("quality"), 4).alias("mean_quality"),
                F.sum("n_tokens").alias("tokens"),
            )
        )
        report = {
            "n_docs": docs.count(),
            "languages": {
                r["detected_lang"]: {
                    "docs": r["docs"],
                    "mean_quality": r["mean_quality"],
                    "tokens": r["tokens"],
                }
                for r in prof.collect()
            },
        }
        exact = exact_duplicate_groups(docs).agg(
            F.count("*").alias("groups"), F.sum("n_docs").alias("docs")
        ).collect()[0]
        report["exact_dups"] = {"groups": exact["groups"] or 0, "docs": exact["docs"] or 0}
        clusters = duplicate_clusters(ngram_jaccard_pairs(docs))
        near = clusters.agg(
            F.countDistinct("cluster_id").alias("clusters"),
            F.count("*").alias("docs"),
            F.max("cluster_size").alias("largest"),
        ).collect()[0]
        report["near_dup_clusters"] = {
            "clusters": near["clusters"],
            "docs": near["docs"],
            "largest": near["largest"] or 0,
        }
        from wcdimportbot_spark.operators.curation import canonical_docs

        keep = canonical_docs(docs, clusters=clusters).agg(
            F.sum(F.col("keep").cast("int")).alias("kept"),
            F.sum((~F.col("keep")).cast("int")).alias("dropped"),
        ).collect()[0]
        report["keep_policy"] = {
            "kept_canonical": keep["kept"] or 0,
            "dropped_duplicates": keep["dropped"] or 0,
        }
        from wcdimportbot_spark.operators.text_dedup import url_dedup

        if "url" in docs.columns:
            u = url_dedup(docs).agg(
                F.count("*").alias("urls"),
                F.sum(F.col("n_docs") - 1).alias("url_dups"),
            ).collect()[0]
            report["url_dedup"] = {
                "canonical_urls": u["urls"],
                "duplicate_docs": u["url_dups"] or 0,
            }
        report["heavy_ngrams"] = [
            {"gram": r["gram"], "df": r["df"]}
            for r in heavy_ngrams(docs, n=3, k=5).collect()
        ]
        from wcdimportbot_spark.operators.text_analysis import repetition_profile
        from wcdimportbot_spark.operators.text_dedup import repeated_spans

        rep = repetition_profile(docs).agg(
            F.sum(F.col("repetitive").cast("int")).alias("repetitive"),
            F.round(F.avg("max_rep"), 4).alias("mean_max_rep"),
        ).collect()[0]
        report["repetition"] = {
            "repetitive_docs": rep["repetitive"] or 0,
            "mean_max_rep": rep["mean_max_rep"],
        }
        spans = repeated_spans(docs).agg(
            F.sum(F.col("flagged").cast("int")).alias("flagged"),
            F.sum((F.col("n_shared") > 0).cast("int")).alias("any_shared"),
        ).collect()[0]
        report["repeated_spans"] = {
            "flagged_docs": spans["flagged"] or 0,
            "docs_with_shared_spans": spans["any_shared"] or 0,
        }
        if args.eval_docs:
            eval_docs = spark.read.parquet(args.eval_docs)
            decon = decontaminate(docs, eval_docs).agg(
                F.count("*").alias("overlapping"),
                F.sum(F.col("contaminated").cast("int")).alias("contaminated"),
            ).collect()[0]
            report["decontamination"] = {
                "overlapping_docs": decon["overlapping"],
                "contaminated_docs": decon["contaminated"] or 0,
            }
        if args.token_budget:
            report["mixture_sample"] = {
                r["lang"]: {
                    "docs_selected": r["n_docs_selected"],
                    "tokens_selected": r["n_tokens_selected"],
                    "utilization": r["utilization"],
                }
                for r in mixture_sample(docs, args.token_budget).collect()
            }
        if args.write_shards:
            from wcdimportbot_spark.operators.training_prep import (
                write_training_shards,
            )

            write_training_shards(docs, args.write_shards, epoch=args.epoch)
            report["shards_written"] = args.write_shards
        print(json.dumps(report, indent=2, sort_keys=True))

    else:
        parser.print_help()
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
