"""sf1 rehearsal of the round-14 seams (r13 verdict Next #5): the
refresh-with-spill path and the bound-ANN purge arm, measured at the
synthetic sf1 corpus (scripts/gen_sf1.py — 50,480 fresh documents,
20,000 embeddings) so the 100 TB extrapolation for the NEW paths is
measured, not argued.

Prints one JSON dict per phase with wall time and write-amplification
(du -sb deltas of the store tree; hardlinked snapshots mean the delta
IS the new bytes). Numbers land in SCALE.md §Round 14.

Run on a QUIET host: python scripts/rehearse_r14_sf1.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/repo/.sf1"


def du(path: str) -> int:
    out = subprocess.run(
        ["du", "-sb", path], capture_output=True, text=True, check=True
    )
    return int(out.stdout.split()[0])


def main() -> None:
    from pyspark.sql import functions as F

    from wcdimportbot_spark import get_spark
    from wcdimportbot_spark.plans import curation_nightly as cn

    spark = get_spark(app_name="rehearse-r14")
    docs = spark.read.parquet(f"{SF1}/documents.parquet").localCheckpoint(
        eager=True
    )
    n_docs = docs.count()
    base = tempfile.mkdtemp(prefix="r14-refresh-")
    results = {}
    try:
        # ---- seed: one full-corpus increment ----
        t0 = time.time()
        cn.curate_increment(docs, base)
        results["seed_increment"] = {
            "n_docs": n_docs,
            "wall_sec": round(time.time() - t0, 1),
            "store_bytes": du(base),
        }
        print(json.dumps({"seed_increment": results["seed_increment"]}))

        # ---- refresh-with-spill: 15k edited docs, cap 5k (the real
        # cap is 100k; sf1 has 50k docs, so the cap is scaled to keep
        # the same 3x over-cap ratio a bulk production re-crawl hits) ----
        cap0 = cn.MARKER_HASHES_CAP
        cn.MARKER_HASHES_CAP = 5000
        edited = (
            docs.filter(F.col("doc_id") % 3 == 0)
            .limit(15000)
            .withColumn(
                "text",
                F.concat(
                    F.col("text"),
                    F.lit(" The revised edition adds further analysis."),
                ),
            )
            .localCheckpoint(eager=True)
        )
        n_edit = edited.count()
        try:
            # crash the internal purge AFTER the spills land (between
            # corpus and index arms), then heal on the retry — the
            # exact bulk-recrawl crash story the spill exists for
            import unittest.mock as mock

            import wcdimportbot_spark.operators.text_dedup as td

            b0 = du(base)
            t0 = time.time()
            try:
                with mock.patch.object(
                    td,
                    "dedup_index_delete",
                    side_effect=RuntimeError("killed"),
                ):
                    cn.curate_refresh(edited, base)
            except RuntimeError:
                pass
            crash_sec = time.time() - t0
            marker = cn.purge_state(base)
            spill_dir = os.path.join(base, "_PURGE_SPILL")
            results["refresh_crash"] = {
                "n_edited": n_edit,
                "wall_sec": round(crash_sec, 1),
                "marker_pending": marker.get("status") == "pending",
                "ids_spilled": bool(marker.get("refresh_ids_spill")),
                "hashes_spilled": bool(marker.get("hashes_spill")),
                "spill_bytes": du(spill_dir)
                if os.path.isdir(spill_dir)
                else 0,
            }
            print(json.dumps({"refresh_crash": results["refresh_crash"]}))

            t0 = time.time()
            ann = cn.curate_refresh(edited, base)
            n_refreshed = ann.filter(F.col("refreshed")).count()
            heal_sec = time.time() - t0
            b1 = du(base)
            results["refresh_heal"] = {
                "wall_sec": round(heal_sec, 1),
                "n_refreshed": n_refreshed,
                "marker": cn.purge_state(base).get("status"),
                "bytes_written": b1 - b0,
                "logical_row_bytes": int(
                    edited.select(
                        F.sum(F.length("text") + 48)
                    ).first()[0]
                ),
            }
            results["refresh_heal"]["write_amplification"] = round(
                (b1 - b0)
                / max(1, results["refresh_heal"]["logical_row_bytes"]),
                2,
            )
            print(json.dumps({"refresh_heal": results["refresh_heal"]}))
        finally:
            cn.MARKER_HASHES_CAP = cap0

        # ---- bound-ANN purge arm: build 20k-vector IVFPQ store, bind,
        # hash-form purge of 1000 docs -> derived vec ids + codes delete ----
        from wcdimportbot_spark.operators import ann_store

        emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
        ann_path = os.path.join(base, "ann")
        t0 = time.time()
        ann_store.ann_index_build(emb, ann_path)
        build_sec = time.time() - t0
        cn.bind_ann_store(base, "ann", key="doc_id")
        doomed_hashes = (
            cn.read_curated_corpus(spark, base)
            .filter(F.col("doc_id") < 1000)
            .select("text_hash")
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_doomed = doomed_hashes.count()
        b0 = du(base)
        t0 = time.time()
        res = cn.purge_documents(spark, doomed_hashes, base)
        purge_sec = time.time() - t0
        results["bind_ann_purge"] = {
            "ann_build_sec": round(build_sec, 1),
            "n_doomed_hashes": n_doomed,
            "wall_sec": round(purge_sec, 1),
            "ann_deleted": res["ann_deleted"],
            "corpus_deleted": res["corpus_deleted"],
            "bytes_written": du(base) - b0,
        }
        print(json.dumps({"bind_ann_purge": results["bind_ann_purge"]}))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
