"""sf1 rehearsal of the round-15 seams (r14 verdict Next #5): the ANN
delete-vs-add epoch bracket, the heartbeated scrub sentinel on a
MANY-partition layout (the swap-loop wall time that motivated the
heartbeat), and the import-vs-purge repair at full import scale —
measured at the synthetic sf1 corpus (scripts/gen_sf1.py — 50,480
documents, 20,000 embeddings) so the 100 TB extrapolation for the NEW
paths is measured, not argued.

Prints one JSON dict per phase. Numbers land in SCALE.md §Round 15.

Run on a QUIET host: python scripts/rehearse_r15_sf1.py [phase ...]
(phases: ann_race scrub_heartbeat import_race; default all)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time
import unittest.mock as mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/repo/.sf1"


def du(path: str) -> int:
    out = subprocess.run(
        ["du", "-sb", path], capture_output=True, text=True, check=True
    )
    return int(out.stdout.split()[0])


def phase_ann_race(spark) -> None:
    """Force the delete-vs-add schedule on a 20k-vector store: the
    delete's attempt-0 publish holds open while a full add of 64 doomed
    ids' negated embeddings lands; the bracket must re-resolve and
    re-delete. The scale question: what does the repair COST beyond the
    no-race path (one extra 2-int-column scan + one pruned publish)?"""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators import ann_store as ann
    from wcdimportbot_spark.operators import sinks

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").localCheckpoint(
        eager=True
    )
    n_vec = emb.count()
    base = tempfile.mkdtemp(prefix="r15-annrace-")
    try:
        t0 = time.time()
        ann.ann_index_build(emb, base)
        build_sec = time.time() - t0

        # no-race baseline: the same-size delete without interference
        t0 = time.time()
        n_base = ann.ann_index_delete(
            spark.range(64, 128).withColumnRenamed("id", "vec_id"), base
        )
        delete_plain_sec = time.time() - t0

        doomed = spark.range(0, 64).withColumnRenamed("id", "vec_id")
        negated = emb.filter(F.col("vec_id") < 64).select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
        resolved = threading.Event()
        add_done = threading.Event()
        real_del = sinks.delete_from_store
        state = {"armed": True, "publishes": 0, "t_repair0": 0.0}

        def gated(spark_, pairs, path, **kw):
            state["publishes"] += 1
            if state["armed"]:
                state["armed"] = False
                resolved.set()
                add_done.wait(600)
            if state["publishes"] == 2:
                state["t_repair0"] = time.time()
            return real_del(spark_, pairs, path, **kw)

        out = {}

        def run_delete():
            t = time.time()
            out["n"] = ann.ann_index_delete(doomed, base)
            out["wall"] = time.time() - t

        with mock.patch.object(sinks, "delete_from_store", gated):
            th = threading.Thread(target=run_delete)
            th.start()
            resolved.wait(600)
            t0 = time.time()
            ann.ann_index_add_batch(negated, base)
            add_sec = time.time() - t0
            t_release = time.time()
            add_done.set()
            th.join(1200)
        repair_sec = time.time() - t_release
        codes = ann.read_ann_codes(spark, base)
        print(
            json.dumps(
                {
                    "ann_race": {
                        "n_vectors": n_vec,
                        "build_sec": round(build_sec, 1),
                        "delete_no_race_sec": round(delete_plain_sec, 1),
                        "n_no_race_deleted": n_base,
                        "racing_add_sec": round(add_sec, 1),
                        "delete_publishes": state["publishes"],
                        "repair_tail_sec": round(repair_sec, 1),
                        "rows_deleted_total": out.get("n"),
                        "doomed_remaining": codes.join(
                            F.broadcast(doomed), "vec_id", "left_semi"
                        ).count(),
                        "duplicate_ids": codes.groupBy("vec_id")
                        .count()
                        .filter("count > 1")
                        .count(),
                    }
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def phase_scrub_heartbeat(spark) -> None:
    """Scrub a 512-partition layout touching EVERY partition — the
    O(touched partitions) swap loop the heartbeat exists for. Reports
    the swap-loop wall time, the heartbeat cadence actually achieved
    (max gap between sentinel rewrites), and a concurrent guarded
    reader's fate under the DEFAULT wait knob."""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators import sinks

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    root = tempfile.mkdtemp(prefix="r15-scrubhb-")
    path = os.path.join(root, "out")
    try:
        (
            docs.select(
                F.md5("text").alias("text_hash"),
                (F.col("doc_id") % 512).cast("int").alias("batch_id"),
            )
            .repartition(32)
            .write.partitionBy("batch_id")
            .parquet(path)
        )
        n_parts = sum(
            1 for n in os.listdir(path) if n.startswith("batch_id=")
        )
        # one doomed row per partition -> all partitions touched
        doomed = (
            docs.filter(F.col("doc_id") < 512)
            .select(F.md5("text").alias("text_hash"))
            .distinct()
            .localCheckpoint(eager=True)
        )

        stamps = []
        real_sent = sinks._write_scrub_sentinel

        def stamped(p, payload):
            stamps.append(time.time())
            return real_sent(p, payload)

        reader_out = {}

        def reader():
            while not os.path.exists(
                os.path.join(path, sinks.SCRUB_SENTINEL)
            ):
                if reader_out.get("give_up"):
                    return
                time.sleep(0.005)
            t = time.time()
            try:
                sinks.assert_no_scrub_pending(path)  # DEFAULT wait knob
                reader_out["waited_sec"] = round(time.time() - t, 2)
            except Exception as e:  # noqa: BLE001 — recorded
                reader_out["err"] = repr(e)

        th = threading.Thread(target=reader)
        th.start()
        t0 = time.time()
        with mock.patch.object(sinks, "_write_scrub_sentinel", stamped):
            res = sinks.scrub_plain_partitions(
                spark, path, doomed, "text_hash", ["batch_id"]
            )
        scrub_sec = time.time() - t0
        reader_out["give_up"] = True
        th.join(60)
        gaps = [b - a for a, b in zip(stamps, stamps[1:])]
        swap_loop_sec = (stamps[-1] - stamps[0]) if len(stamps) > 1 else 0.0
        print(
            json.dumps(
                {
                    "scrub_heartbeat": {
                        "n_partitions": n_parts,
                        "partitions_rewritten": res["partitions_rewritten"],
                        "rows_deleted": res["rows_deleted"],
                        "scrub_wall_sec": round(scrub_sec, 1),
                        "swap_loop_sec": round(swap_loop_sec, 2),
                        "heartbeats": len(stamps),
                        "max_heartbeat_gap_sec": round(max(gaps), 2)
                        if gaps
                        else None,
                        "per_swap_ms": round(
                            1000 * swap_loop_sec / max(1, n_parts), 2
                        ),
                        "reader": reader_out,
                    }
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def phase_import_race(spark) -> None:
    """Import-vs-purge repair at FULL import scale: a 50,480-page
    import's claims merge holds open while a purge of every item hash
    runs inside its window; the import's epoch check must detect and
    re-assert both merges (purge→import serial order — all content
    back). The scale number: the re-assert is one idempotent anti-join
    re-merge over the full batch."""
    from pyspark.sql import functions as F  # noqa: F401 — plan exprs

    import __spark_entry__ as entry_mod
    from wcdimportbot_spark.operators import sinks
    from wcdimportbot_spark.plans import curation_nightly as cn
    from wcdimportbot_spark.plans import store_import as si
    from wcdimportbot_spark.plans.pipeline import run_import

    pages = entry_mod.pages_from_documents(spark, SF1).localCheckpoint(
        eager=True
    )
    n_pages = pages.count()
    tmp = tempfile.mkdtemp(prefix="r15-importrace-")
    store = os.path.join(tmp, "graph")
    cur = os.path.join(tmp, "cur")
    gpaths = si.store_paths(store)
    try:
        t0 = time.time()
        doomed_pairs = (
            run_import(pages)
            .items.select(
                F.col("hash"), F.col("qid").alias("subject_qid")
            )
            .localCheckpoint(eager=True)
        )
        n_items = doomed_pairs.count()
        derive_sec = time.time() - t0

        items_merged = threading.Event()
        purge_done = threading.Event()
        real_mwc = sinks.merge_write_claims
        real_mwi = sinks.merge_write_items
        state = {"claims_merges": 0}

        def gated_mwi(s_, df, path, **kw):
            out = real_mwi(s_, df, path, **kw)
            items_merged.set()
            return out

        def gated_mwc(s_, df, path, **kw):
            state["claims_merges"] += 1
            if state["claims_merges"] == 1:
                purge_done.wait(3600)
            return real_mwc(s_, df, path, **kw)

        errs, out = [], {}

        def run_import_thread():
            try:
                t = time.time()
                si.import_pages_to_store(spark, pages, gpaths)
                out["import_sec"] = time.time() - t
            except Exception as e:
                errs.append(e)

        with mock.patch.object(sinks, "merge_write_items", gated_mwi), \
             mock.patch.object(sinks, "merge_write_claims", gated_mwc):
            th = threading.Thread(target=run_import_thread)
            th.start()
            items_merged.wait(3600)
            t0 = time.time()
            cn.purge_documents(
                spark,
                spark.createDataFrame([], "text_hash string"),
                cur,
                graph_store=store,
                item_hashes=doomed_pairs,
            )
            purge_sec = time.time() - t0
            purge_done.set()
            th.join(3600)
            ok = not th.is_alive() and not errs
        n_after = sinks.read_items(spark, gpaths["items"]).count()
        consistent = (
            si.verify_import_consistency(store)["status"] == "consistent"
        )
        print(
            json.dumps(
                {
                    "import_race": {
                        "n_pages": n_pages,
                        "n_items": n_items,
                        "derive_sec": round(derive_sec, 1),
                        "import_sec_with_repair": round(
                            out.get("import_sec", -1), 1
                        ),
                        "purge_inside_window_sec": round(purge_sec, 1),
                        "claims_merges": state["claims_merges"],
                        "ok": ok,
                        "serial_items_present": n_after,
                        "manifest_consistent": consistent,
                        "errs": [repr(e) for e in errs],
                    }
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    from wcdimportbot_spark import get_spark

    spark = get_spark(app_name="rehearse-r15")
    phases = sys.argv[1:] or ["ann_race", "scrub_heartbeat", "import_race"]
    for p in phases:
        globals()[f"phase_{p}"](spark)


if __name__ == "__main__":
    main()
