import pytest
"""CLI command-surface tests (in-process main() to reuse the session)."""

import json

from wcdimportbot_spark.cli import main


@pytest.mark.slow
def test_cli_roundtrip(spark, tmp_path, capsys):
    store = str(tmp_path / "store")

    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    out = capsys.readouterr().out
    assert "imported: 1 pages, 3 new items" in out

    # idempotent re-import
    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    assert "0 new items" in capsys.readouterr().out

    # statistics on the populated store
    assert main(["--store", store, "--statistics"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["items"] == {
        "WEBSITE_ITEM": 1,
        "WIKIPEDIA_PAGE": 1,
        "WIKIPEDIA_REFERENCE": 1,
    }
    assert stats["properties"]["CITATIONS"] == 1

    # lookup an existing hash via the cache
    from wcdimportbot_spark.operators.sinks import read_snapshot

    h = read_snapshot(spark, store + "/cache").collect()[0]["hash"]
    assert main(["--store", store, "--lookup-md5hash", h]) == 0
    out = capsys.readouterr().out
    assert f"Q{h}" in out

    # delete the page item, keep reference/website
    assert main(["--store", store, "--delete-page", "Easter Island"]) == 0
    assert "deleted 1 page item(s)" in capsys.readouterr().out
    assert main(["--store", store, "--statistics"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert "WIKIPEDIA_PAGE" not in stats["items"]

    # rinse empties everything
    assert main(["--store", store, "--rinse"]) == 0


def test_cli_statistics_empty_store(tmp_path, capsys):
    assert main(["--store", str(tmp_path / "none"), "--statistics"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats == {"items": {}, "properties": {}}


def test_cli_delete_page_with_long_title(spark, tmp_path, capsys):
    """Stored page labels are truncated to 250 chars; delete-by-title must
    apply the same truncation or long-titled pages become undeletable."""
    store = str(tmp_path / "store")
    long_title = "Llanfairpwllgwyngyll " * 20  # ~420 chars, word-delimited
    long_title = long_title.strip()

    assert main(["--store", store, "--import-title", long_title]) == 0
    assert "imported: 1 pages" in capsys.readouterr().out
    assert main(["--store", store, "--delete-page", long_title]) == 0
    assert "deleted 1 page item(s)" in capsys.readouterr().out

    from wcdimportbot_spark.operators.sinks import read_snapshot

    items = read_snapshot(spark, store + "/items")
    assert items.filter(items.instance_of == "WIKIPEDIA_PAGE").count() == 0


def test_cli_reimport_preserves_qualifier_distinct_claims(spark, tmp_path, capsys):
    """Claims differing only in qualifiers (or value_quantity) must survive a
    re-import: merge is conflict-as-success per subject, never row-level
    dedup across imports."""
    from wcdimportbot_spark.operators import versioned
    from wcdimportbot_spark.operators.sinks import read_snapshot

    store = str(tmp_path / "store")
    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    capsys.readouterr()

    claims_path = store + "/claims"
    claims = read_snapshot(spark, claims_path)
    n0 = claims.count()

    # forge a twin of an existing claim differing only in value_quantity —
    # a column the old dropDuplicates key ignored, so the pair collapsed —
    # by publishing a new snapshot version holding the forged table
    from pyspark.sql import functions as F

    twin = claims.limit(1).withColumn("value_quantity", F.lit(99.0))
    forged = claims.unionByName(twin).localCheckpoint(eager=True)
    version, vdir = versioned.stage_new(claims_path)
    forged.write.mode("overwrite").partitionBy("property", "hb").parquet(vdir)
    versioned.publish(claims_path, version)

    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    assert "0 new items" in capsys.readouterr().out
    assert read_snapshot(spark, claims_path).count() == n0 + 1


@pytest.mark.slow
def test_incremental_merge_rewrites_only_touched_buckets(spark, tmp_path, capsys):
    """Importing one page over a populated store must rewrite EXACTLY the
    ``(instance_of, hb)`` partitions that gain rows — every other file of
    the new snapshot must be a HARDLINK of the previous version's file
    (same inode, no data copied) — and a re-import of an already-stored
    page must publish NO new snapshot (VERDICT: incremental MERGE sink +
    atomic versioned publish)."""
    import glob
    import os

    from wcdimportbot_spark.operators import versioned
    from wcdimportbot_spark.operators.sinks import read_snapshot

    store = str(tmp_path / "store")
    for i in range(12):
        assert main(["--store", store, "--import-title", f"Page Number {i}"]) == 0
    capsys.readouterr()

    def snapshot(sub):
        """Current-version files keyed by snapshot-relative path; hardlinks
        carry the previous inode+mtime, so unchanged files compare equal
        across versions."""
        base = versioned.data_dir(os.path.join(store, sub))
        out = {}
        for f in glob.glob(os.path.join(base, "**", "*.parquet"), recursive=True):
            st = os.stat(f)
            out[os.path.relpath(f, base)] = (st.st_ino, st.st_mtime_ns, st.st_size)
        return out

    def changed_dirs(before, after):
        touched = {
            f for f, meta in after.items() if before.get(f) != meta
        } | (set(before) - set(after))
        return {os.path.dirname(f) for f in touched}

    def rows(sub, cols):
        df = read_snapshot(spark, os.path.join(store, sub))
        return {tuple(r) for r in df.select(*cols).collect()}

    before_items = snapshot("items")
    before_claims = snapshot("claims")
    before_item_rows = rows("items", ["hash", "instance_of", "hb"])
    before_claim_rows = rows("claims", ["subject_qid", "property", "hb"])
    assert len(before_items) > 6, "store should span several bucket partitions"

    assert main(["--store", store, "--import-title", "One More Page"]) == 0
    capsys.readouterr()

    # the rewritten partition dirs must be exactly the dirs of the new rows
    def expect_dirs(new_rows, col1):
        return {os.path.join(f"{col1}={a}", f"hb={b}") for (_, a, b) in new_rows}

    new_item_rows = rows("items", ["hash", "instance_of", "hb"]) - before_item_rows
    new_claim_rows = rows("claims", ["subject_qid", "property", "hb"]) - before_claim_rows
    assert new_item_rows, "a new page must add items"

    ch_items = changed_dirs(before_items, snapshot("items"))
    ch_claims = changed_dirs(before_claims, snapshot("claims"))
    assert ch_items == expect_dirs(new_item_rows, "instance_of")
    assert ch_claims == expect_dirs(new_claim_rows, "property")
    assert len(ch_items) < len({os.path.dirname(f) for f in before_items}), (
        "must not rewrite the whole store"
    )

    # re-importing a stored page adds nothing and must publish NO snapshot
    mid_ver = versioned.current_version(os.path.join(store, "items"))
    mid_items, mid_claims = snapshot("items"), snapshot("claims")
    assert main(["--store", store, "--import-title", "One More Page"]) == 0
    out = capsys.readouterr().out
    assert "0 new items" in out
    assert versioned.current_version(os.path.join(store, "items")) == mid_ver
    assert changed_dirs(mid_items, snapshot("items")) == set()
    assert changed_dirs(mid_claims, snapshot("claims")) == set()

    # store contents still correct: 13 pages worth of items
    items = read_snapshot(spark, store + "/items")
    assert items.filter(items.instance_of == "WIKIPEDIA_PAGE").count() == 13


@pytest.mark.slow
def test_empty_import_does_not_poison_store(spark, tmp_path, capsys):
    """An import that selects zero pages must leave the store readable
    (writers skip empty batches; readers treat data-less dirs as absent)
    and a later real import must still work."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("page_id", T.LongType()),
            T.StructField("title", T.StringType()),
            T.StructField("language_code", T.StringType()),
            T.StructField("latest_revision_id", T.LongType()),
            T.StructField("wikitext", T.StringType()),
        ]
    )
    dump = str(tmp_path / "empty_dump.parquet")
    spark.createDataFrame([], schema).write.parquet(dump)
    store = str(tmp_path / "store")

    assert main(["--store", store, "--import-pages", dump]) == 0
    assert "0 new items" in capsys.readouterr().out
    # empty store: statistics and lookup must not raise schema errors
    assert main(["--store", store, "--statistics"]) == 0
    capsys.readouterr()

    assert main(["--store", store, "--import-title", "Fresh Page"]) == 0
    capsys.readouterr()
    assert main(["--store", store, "--statistics"]) == 0
    assert '"WIKIPEDIA_PAGE": 1' in capsys.readouterr().out


@pytest.mark.slow
def test_cli_import_events_stream(spark, tmp_path, capsys):
    """--import-events consumes a JSON event directory into the store via
    the streaming sink; re-running on the same checkpoint is a no-op."""
    src = tmp_path / "events"
    src.mkdir()
    events = [
        {"server_name": "en.wikipedia.org", "namespace": 0, "title": t,
         "bot": False, "type": "edit", "ts": "2026-01-01T10:00:00.000Z"}
        for t in ("CLI Stream A", "CLI Stream B")
    ]
    (src / "b.json").write_text("\n".join(json.dumps(e) for e in events))
    store = str(tmp_path / "store")

    assert main(["--store", store, "--import-events", str(src)]) == 0
    assert "2 events" in capsys.readouterr().out
    assert main(["--store", store, "--statistics"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["items"]["WIKIPEDIA_PAGE"] == 2

    # same checkpoint → nothing redelivered, store unchanged
    assert main(["--store", store, "--import-events", str(src)]) == 0
    assert "0 events" in capsys.readouterr().out
    assert main(["--store", store, "--statistics"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["items"]["WIKIPEDIA_PAGE"] == 2


def test_cli_import_events_cap_and_rinse(spark, tmp_path, capsys):
    """--max-events larger than the available events must drain and exit
    (cap is a ceiling, not a wait target); --rinse clears the streaming
    checkpoint so the same events can be re-imported afterwards."""
    src = tmp_path / "events"
    src.mkdir()
    events = [
        {"server_name": "en.wikipedia.org", "namespace": 0, "title": t,
         "bot": False, "type": "edit", "ts": "2026-01-01T10:00:00.000Z"}
        for t in ("Cap A", "Cap B")
    ]
    (src / "b.json").write_text("\n".join(json.dumps(e) for e in events))
    store = str(tmp_path / "store")

    # cap above available: drains 2 events and exits (no hang)
    assert main(["--store", store, "--import-events", str(src),
                 "--max-events", "100"]) == 0
    assert "2 events" in capsys.readouterr().out

    # zero cap: processes nothing, deterministically
    assert main(["--store", store, "--import-events", str(src),
                 "--max-events", "0"]) == 0
    assert "0 events in 0 batches" in capsys.readouterr().out

    # rinse clears the checkpoint too → the same directory re-imports
    assert main(["--store", store, "--rinse"]) == 0
    capsys.readouterr()
    assert main(["--store", store, "--import-events", str(src)]) == 0
    assert "2 events" in capsys.readouterr().out
    assert main(["--store", store, "--statistics"]) == 0
    assert json.loads(capsys.readouterr().out)["items"]["WIKIPEDIA_PAGE"] == 2


@pytest.mark.slow
def test_cli_delete_page_allows_reimport(spark, tmp_path, capsys):
    """Deleting a page must also remove its hash from the cache (the
    reference deletes the cache key, src/__init__.py:181) — otherwise the
    P12 already-uploaded guard skips the page forever."""
    store = str(tmp_path / "store")
    assert main(["--store", store, "--import-title", "Phoenix Page"]) == 0
    capsys.readouterr()
    assert main(["--store", store, "--delete-page", "Phoenix Page"]) == 0
    assert "deleted 1 page item(s)" in capsys.readouterr().out

    # re-import must actually import the page again, not silently no-op
    assert main(["--store", store, "--import-title", "Phoenix Page"]) == 0
    assert "1 pages, 1 new items" in capsys.readouterr().out
    assert main(["--store", store, "--statistics"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["items"]["WIKIPEDIA_PAGE"] == 1


def test_cli_import_events_surfaces_stream_failure(spark, tmp_path, monkeypatch):
    """A stream killed by a foreachBatch error is INACTIVE — the CLI must
    still re-raise (query.exception() check), not exit 0."""
    import pytest

    from wcdimportbot_spark.plans import store_import

    def poisoned_batch_fn(store):
        def process(batch_df, epoch_id):
            raise RuntimeError("poisoned batch")

        return process

    monkeypatch.setattr(store_import, "store_import_batch_fn", poisoned_batch_fn)
    src = tmp_path / "events"
    src.mkdir()
    event = {"server_name": "en.wikipedia.org", "namespace": 0,
             "title": "Poisoned", "bot": False, "type": "edit",
             "ts": "2026-01-01T10:00:00.000Z"}
    (src / "b.json").write_text(json.dumps(event))
    store = str(tmp_path / "store")
    with pytest.raises(Exception):
        main(["--store", store, "--import-events", str(src)])


@pytest.mark.slow
def test_cli_curate_report(spark, tmp_path, capsys):
    """--curate prints an aggregate-only JSON curation report; with
    --eval-docs it adds the decontamination section, with --token-budget
    the mixture-sample section."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eval_path = str(tmp_path / "eval.parquet")
    docs.filter("doc_id % 25 = 0").write.parquet(eval_path)

    assert (
        main(
            [
                "--store", str(tmp_path / "store"),
                "--curate", "/root/testdata/sf0.001/documents.parquet",
                "--eval-docs", eval_path,
                "--token-budget", "1500",
            ]
        )
        == 0
    )
    report = json.loads(capsys.readouterr().out)
    assert report["n_docs"] == 500
    assert sum(v["docs"] for v in report["languages"].values()) == 500
    assert report["exact_dups"]["docs"] >= report["exact_dups"]["groups"]
    assert report["near_dup_clusters"]["largest"] >= 2 or (
        report["near_dup_clusters"]["clusters"] == 0
    )
    assert len(report["heavy_ngrams"]) == 5
    assert report["repetition"]["repetitive_docs"] >= 0
    # keep policy: exactly one canonical doc per near-dup cluster
    assert report["keep_policy"]["kept_canonical"] == report[
        "near_dup_clusters"
    ]["clusters"]
    assert (
        report["keep_policy"]["kept_canonical"]
        + report["keep_policy"]["dropped_duplicates"]
        == report["near_dup_clusters"]["docs"]
    )
    assert "url_dedup" not in report  # documents table carries no url column
    assert 0 <= report["repeated_spans"]["flagged_docs"] <= report[
        "repeated_spans"
    ]["docs_with_shared_spans"]
    # the eval split is drawn from the corpus itself -> its own docs overlap
    assert report["decontamination"]["overlapping_docs"] > 0
    assert 0 <= report["decontamination"]["contaminated_docs"] <= report[
        "decontamination"
    ]["overlapping_docs"]
    for v in report["mixture_sample"].values():
        assert v["tokens_selected"] <= 1500


def test_cli_curate_write_shards(spark, tmp_path, capsys):
    out = str(tmp_path / "shards")
    assert (
        main(
            [
                "--store", str(tmp_path / "store"),
                "--curate", "/root/testdata/sf0.001/documents.parquet",
                "--write-shards", out,
                "--epoch", "2",
            ]
        )
        == 0
    )
    report = json.loads(capsys.readouterr().out)
    assert report["shards_written"] == out
    back = spark.read.parquet(out)
    assert back.count() == 500
    assert {"split", "shard", "pos"} <= set(back.columns)


def test_cli_dedup_ingest_two_batches(spark, tmp_path, capsys):
    """The production dedup loop from the command line: batch 1 seeds the
    index (all fresh), batch 2's exact/near dupes of batch-1 survivors
    are reported and excluded from --fresh-out."""
    b1 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog near the river bank"),
            (11, "completely different words about spark catalyst optimizer plans"),
        ],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [
            (20, "the quick brown fox jumps over the lazy dog near the river bank"),
            (21, "the quick brown fox jumps over the lazy dog near the river bend"),
            (22, "unrelated fresh content about parquet row group statistics"),
        ],
        "doc_id long, text string",
    )
    d1, d2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    b1.write.parquet(d1)
    b2.write.parquet(d2)
    store = str(tmp_path / "store")
    index = str(tmp_path / "index")
    fresh_out = str(tmp_path / "fresh")

    assert main(["--store", store, "--dedup-ingest", d1,
                 "--dedup-index", index, "--fresh-out", fresh_out]) == 0
    rep1 = json.loads(capsys.readouterr().out)
    assert rep1 == {"n_docs": 2, "n_fresh": 2, "n_exact_dup": 0,
                    "n_near_dup": 0, "index": index}

    assert main(["--store", store, "--dedup-ingest", d2,
                 "--dedup-index", index, "--fresh-out", fresh_out]) == 0
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["n_fresh"] == 1 and rep2["n_exact_dup"] == 1
    assert rep2["n_near_dup"] >= 1  # doc 21; doc 20 may collide too

    spark.catalog.refreshByPath(fresh_out)
    fresh_ids = {r["doc_id"] for r in spark.read.parquet(fresh_out).collect()}
    assert fresh_ids == {10, 11, 22}

    # grow the index's bucket fanout in place (the purge write-amp
    # lever): split one hashes bucket, then re-ingest batch 1 — still
    # all duplicates under the split map
    from wcdimportbot_spark.operators import sinks

    hpath = str(tmp_path / "index" / "hashes")
    hb = sinks.read_snapshot(spark, hpath).select(sinks.BUCKET_COL).first()[0]
    assert main(["--store", store, "--dedup-index", index,
                 "--split-bucket", str(hb), "--split-table",
                 "dedup-hashes"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["bucket"] == hb and len(info["children"]) == 2
    assert main(["--store", store, "--dedup-ingest", d1,
                 "--dedup-index", index, "--fresh-out", fresh_out]) == 0
    rep3 = json.loads(capsys.readouterr().out)
    assert rep3["n_fresh"] == 0 and rep3["n_exact_dup"] == 2


def test_cli_ann_compact_and_sketch_prune(spark, tmp_path, capsys):
    """Round-10 maintenance surface: --compact --ann-store folds the ANN
    codes store alongside the graph stores; --sketch-prune ages windows
    out of the sketch store (folding them into the lifetime row)."""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators.ann_store import (
        ann_index_add_batch,
        ann_index_build,
    )
    from wcdimportbot_spark.streaming.sketch_gate import (
        windowed_distinct_sketch_batch_fn,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ann = str(tmp_path / "ann")
    ann_index_build(emb.filter(F.col("vec_id") % 2 == 0), ann)
    ann_index_add_batch(emb.filter(F.col("vec_id") % 2 == 1), ann)

    store = str(tmp_path / "store")
    assert main(["--store", store, "--compact", "--ann-store", ann]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ann_codes"]["compacted_partitions"] > 0

    sk = str(tmp_path / "sketch")
    ev = spark.createDataFrame(
        [(1, "2024-03-01T10:00:00", 1, "click"),
         (2, "2024-03-02T10:00:00", 2, "click")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    windowed_distinct_sketch_batch_fn(sk, lg_k=12)(ev, 0)
    assert main(
        ["--store", store, "--sketch-store", sk, "--sketch-prune", "2024-03-02"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"pruned_windows": 1}


def test_cli_ann_lifecycle(spark, tmp_path, capsys):
    """--ann-build / --ann-add / --ann-probe / --ann-retrain: the full
    maintained-index lifecycle drivable from the command surface, like
    the dedup loop's --dedup-ingest."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    built = str(tmp_path / "built.parquet")
    rest = str(tmp_path / "rest.parquet")
    emb.filter(F.col("vec_id") % 3 != 2).write.parquet(built)
    emb.filter(F.col("vec_id") % 3 == 2).write.parquet(rest)
    full = "/root/testdata/sf0.001/embeddings.parquet"
    store = str(tmp_path / "store")
    ann = str(tmp_path / "ann")

    assert main(["--store", store, "--ann-store", ann, "--ann-build", built]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_built = out["n_built"]
    assert n_built > 0 and out["model_version"] == "v00000001"

    assert main(["--store", store, "--ann-store", ann, "--ann-add", rest]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["added"] > 0 and out["skipped"] == 0
    added = out["added"]

    # replay: idempotent
    assert main(["--store", store, "--ann-store", ann, "--ann-add", rest]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"added": 0, "skipped": added}

    assert main(
        ["--store", store, "--ann-store", ann, "--ann-probe", full,
         "--num-queries", "3", "--topk", "2"]
    ) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 6
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    assert all(r["rank"] in (1, 2) for r in rows)

    # re-crawl refresh: 3 stored ids with changed (negated) embeddings
    # + 1 brand-new id — matched ids REPLACED, not duplicated
    refresh = str(tmp_path / "refresh.parquet")
    emb.filter(F.col("vec_id") < 3).select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    ).unionByName(
        emb.filter(F.col("vec_id") == 3).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    ).write.parquet(refresh)
    assert main(["--store", store, "--ann-store", ann, "--ann-upsert", refresh]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"updated": 3, "added": 4, "skipped": 0}

    assert main(["--store", store, "--ann-store", ann, "--ann-retrain", full]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the retrain corpus is `full`; the store before it held one extra
    # upserted id, but n_built counts the retrain input
    assert out["n_built"] == n_built + added
    assert out["retrained_from"] == "v00000001"


@pytest.mark.slow
def test_import_manifest_detects_crash_between_publishes(spark, tmp_path, monkeypatch, capsys):
    """Cross-store commit manifest (r10 verdict Next #6): one import
    publishes items → claims → cache sequentially; a crash inside that
    window leaves a version skew that was previously only IMPLICITLY
    healed by idempotent replay. The manifest makes the window
    detectable: kill the import between the items and claims publishes,
    assert --verify-store reports 'ahead' with the skewed store named,
    then REPLAY the batch and assert convergence (consistent manifest,
    content identical to a never-crashed import)."""
    from wcdimportbot_spark.operators import sinks, versioned
    from wcdimportbot_spark.plans.store_import import (
        verify_import_consistency,
    )

    store = str(tmp_path / "store")
    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    capsys.readouterr()
    assert verify_import_consistency(store)["status"] == "consistent"
    assert main(["--store", store, "--verify-store"]) == 0
    assert json.loads(capsys.readouterr().out)["status"] == "consistent"

    # kill point: items published, claims/cache not, manifest stale
    real_claims = sinks.merge_write_claims

    def boom(*a, **k):
        raise RuntimeError("killed between the items and claims publishes")

    monkeypatch.setattr(sinks, "merge_write_claims", boom)
    import pytest

    with pytest.raises(RuntimeError, match="killed between"):
        main(["--store", store, "--import-title", "Mars"])
    capsys.readouterr()
    report = verify_import_consistency(store)
    assert report["status"] == "in-flight-or-crashed"
    d = report["detail"]
    # forensics: items advanced past its at-start version, claims did not
    assert d["versions_now"]["items"] > d["versions_at_start"]["items"]
    assert d["versions_now"]["claims"] == d["versions_at_start"]["claims"]
    assert main(["--store", store, "--verify-store"]) == 1  # non-zero exit
    capsys.readouterr()

    # replay heals: items merge is a no-op, claims/cache catch up, the
    # manifest recommits — and the content equals a clean import's
    monkeypatch.setattr(sinks, "merge_write_claims", real_claims)
    assert main(["--store", store, "--import-title", "Mars"]) == 0
    capsys.readouterr()
    assert verify_import_consistency(store)["status"] == "consistent"
    assert main(["--store", store, "--statistics"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["items"]["WIKIPEDIA_PAGE"] == 2

    # maintenance writers advance versions WITHOUT a false positive: the
    # two-phase marker (not version comparison) carries the signal
    assert main(["--store", store, "--split-bucket", "1"]) == 0
    capsys.readouterr()
    assert verify_import_consistency(store)["status"] == "consistent"

    # 'behind' (rollback / operator intervention) is surfaced, not healed
    items_path = str(tmp_path / "store" / "items")
    old = versioned.list_versions(items_path)[0]
    versioned.rollback(items_path, old)
    assert verify_import_consistency(store)["status"] == "behind"


@pytest.mark.slow
def test_cli_purge_docs_with_graph_arm(spark, tmp_path, capsys):
    """--purge-docs + --purge-item-hashes: one CLI call purges the
    curated corpus, the dedup index, AND the doomed items/claims/cache
    rows of --store — the composed GDPR-style forget across every table
    that remembers the content."""
    store = str(tmp_path / "store")
    cur = str(tmp_path / "cur")
    docs = str(tmp_path / "docs.parquet")
    ids = str(tmp_path / "ids.parquet")
    ihashes = str(tmp_path / "ihashes.parquet")

    # a graph store with one imported page (3 items, cache rows)
    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    capsys.readouterr()
    from wcdimportbot_spark.operators.sinks import read_snapshot

    page = (
        read_snapshot(spark, store + "/items")
        .filter("instance_of = 'WIKIPEDIA_PAGE'")
        .select("hash")
    )
    page.write.parquet(ihashes)

    text = "the quick brown fox jumps over the lazy dog near the river bank"
    spark.createDataFrame([(1, text)], "doc_id long, text string").write.parquet(docs)
    assert main(["--store", store, "--curation-store", cur,
                 "--curate-increment", docs]) == 0
    capsys.readouterr()
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(ids)

    assert main(["--store", store, "--curation-store", cur,
                 "--purge-docs", ids, "--purge-item-hashes", ihashes]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["corpus_deleted"] == 1 and res["items_deleted"] == 1
    assert res["cache_deleted"] == 1 and res["state"] == "committed"
    # the page item is gone; reference/website survive; re-import works
    assert main(["--store", store, "--statistics"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert "WIKIPEDIA_PAGE" not in stats["items"]
    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    assert "1 new items" in capsys.readouterr().out


def test_cli_split_corpus_bucket_composes_with_increment(spark, tmp_path, capsys):
    """--split-table corpus grows the curated corpus store's fanout in
    place; a later increment merges under the split map and a purge
    still prunes (the write-amp lever applied to the purge's biggest
    store)."""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators import sinks
    from wcdimportbot_spark.plans import curation_nightly as cn

    store = str(tmp_path / "store")
    cur = str(tmp_path / "cur")
    schema = "doc_id long, text string"
    t1 = "the quick brown fox jumps over the lazy dog near the river bank"
    # novel hash, quality-passing (near-dup of t1 — annotation only,
    # does not gate acceptance in the increment)
    t2 = "the quick brown fox jumps over the lazy dog near the river bend"
    d1 = str(tmp_path / "d1")
    spark.createDataFrame([(1, t1)], schema).write.parquet(d1)
    assert main(["--store", store, "--curation-store", cur,
                 "--curate-increment", d1]) == 0
    capsys.readouterr()

    hb = (
        sinks.read_snapshot(spark, cn._corpus_path(cur))
        .select(sinks.BUCKET_COL)
        .first()[0]
    )
    assert main(["--store", store, "--curation-store", cur,
                 "--split-bucket", str(hb), "--split-table", "corpus"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["bucket"] == hb and len(info["children"]) == 2

    # a later increment merges under the split map; re-sends stay dups
    d2 = str(tmp_path / "d2")
    spark.createDataFrame([(1, t1), (2, t2)], schema).write.parquet(d2)
    assert main(["--store", store, "--curation-store", cur,
                 "--curate-increment", d2]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_kept"] == 1 and rep["n_dup"] == 1
    corpus = cn.read_curated_corpus(spark, cur)
    assert corpus.count() == 2
    # purge through the split map
    ids = str(tmp_path / "ids")
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(ids)
    assert main(["--store", store, "--curation-store", cur,
                 "--purge-docs", ids]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["corpus_deleted"] == 1 and res["state"] == "committed"
    assert cn.read_curated_corpus(spark, cur).count() == 1


@pytest.mark.slow
def test_cli_expire_history(spark, tmp_path, capsys):
    """--expire-history: the standalone history vacuum after ad-hoc
    deletes — old snapshots go, the current one keeps serving, deleted
    rows' bytes are gone from disk."""
    import os

    from wcdimportbot_spark.operators import versioned
    from wcdimportbot_spark.operators.sinks import read_snapshot

    store = str(tmp_path / "store")
    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    capsys.readouterr()
    assert main(["--store", store, "--delete-page", "Easter Island"]) == 0
    capsys.readouterr()
    items = os.path.join(store, "items")
    assert len(versioned.list_versions(items)) > 1

    assert main(["--store", store, "--expire-history", items]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out[items] >= 1
    assert len(versioned.list_versions(items)) == 1
    snap = read_snapshot(spark, items)
    assert snap.filter(snap.instance_of == "WIKIPEDIA_PAGE").count() == 0
    assert snap.count() == 2  # reference + website still served

    # idempotent
    assert main(["--store", store, "--expire-history", items]) == 0
    assert json.loads(capsys.readouterr().out)[items] == 0


def test_cli_purge_shards_and_outputs(spark, tmp_path, capsys):
    """--purge-shards / --purge-outputs compose with --purge-docs: the
    doomed doc leaves the corpus, the shipped shard layout, and the gate
    output dir in one CLI call; --purge-vacuum scrubs retained history."""
    from wcdimportbot_spark.operators import versioned
    from wcdimportbot_spark.operators.training_prep import (
        write_training_shards,
    )
    from wcdimportbot_spark.plans import curation_nightly as cn

    store = str(tmp_path / "store")
    cur = str(tmp_path / "cur")
    docs_p = str(tmp_path / "docs.parquet")
    ids_p = str(tmp_path / "ids.parquet")
    shards = str(tmp_path / "shards")
    out_dir = str(tmp_path / "fresh_out")

    t_a = "the quick brown fox jumps over the lazy dog near the river bank"
    t_b = ("Completely different words are written about the spark "
           "catalyst optimizer plans and how they work in practice.")
    docs = spark.createDataFrame(
        [(1, t_a), (2, t_b)], "doc_id long, text string"
    )
    docs.write.parquet(docs_p)
    assert main(["--store", store, "--curation-store", cur,
                 "--curate-increment", docs_p]) == 0
    capsys.readouterr()
    write_training_shards(docs, shards, epoch=0, n_shards=4)
    ann = {r["doc_id"]: r for r in cn.curate_increment(
        spark.createDataFrame([], "doc_id long, text string"), cur
    ).collect()} if False else None
    import hashlib

    h1 = hashlib.md5(t_a.encode()).hexdigest()
    (
        spark.createDataFrame(
            [(1, h1, 0), (2, hashlib.md5(t_b.encode()).hexdigest(), 0)],
            "doc_id long, text_hash string, batch_id long",
        )
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(ids_p)

    assert main([
        "--store", store, "--curation-store", cur,
        "--purge-docs", ids_p,
        "--purge-shards", shards,
        "--purge-outputs", out_dir,
        "--purge-vacuum",
    ]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["corpus_deleted"] == 1
    assert res["outputs_deleted"] == 1
    assert res["shards_deleted"] == 1
    assert res["history_expired"] >= 1
    assert res["state"] == "committed"
    assert {r["doc_id"] for r in spark.read.parquet(shards).collect()} == {2}
    assert {r["doc_id"] for r in spark.read.parquet(out_dir).collect()} == {2}
    assert len(versioned.list_versions(cn._corpus_path(cur))) == 1


def test_cli_purge_status(spark, tmp_path, capsys):
    """--purge-status surfaces the remediation marker: 'none' before any
    purge, 'committed' (with the recorded identity digests) after one."""
    store = str(tmp_path / "store")
    cur = str(tmp_path / "cur")
    docs_p = str(tmp_path / "docs.parquet")
    ids_p = str(tmp_path / "ids.parquet")

    assert main(["--store", store, "--curation-store", cur,
                 "--purge-status"]) == 0
    assert json.loads(capsys.readouterr().out) == {"status": "none"}

    text = "the quick brown fox jumps over the lazy dog near the river bank"
    spark.createDataFrame([(1, text)], "doc_id long, text string").write.parquet(docs_p)
    assert main(["--store", store, "--curation-store", cur,
                 "--curate-increment", docs_p]) == 0
    capsys.readouterr()
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(ids_p)
    assert main(["--store", store, "--curation-store", cur,
                 "--purge-docs", ids_p]) == 0
    capsys.readouterr()

    assert main(["--store", store, "--curation-store", cur,
                 "--purge-status"]) == 0
    marker = json.loads(capsys.readouterr().out)
    assert marker["status"] == "committed"
    assert marker["arms"] == ["corpus", "index"]


def test_cli_bind_ann_and_derived_purge_arm(spark, tmp_path, capsys):
    """--bind-ann records the ANN binding; a later --purge-docs with NO
    --purge-ann-ids still prunes the doomed vectors from the codes
    store (the r12 forgotten-arm hazard, closed)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from wcdimportbot_spark.operators.ann_store import (
        ann_index_build,
        read_ann_codes,
    )

    store = str(tmp_path / "store")
    cur = str(tmp_path / "cur")
    ann_dir = str(tmp_path / "ann")
    docs_p = str(tmp_path / "docs.parquet")
    ids_p = str(tmp_path / "ids.parquet")

    t_a = "the quick brown fox jumps over the lazy dog near the river bank"
    t_b = ("Completely different words are written about the spark "
           "catalyst optimizer plans and how they work in practice.")
    spark.createDataFrame(
        [(1, t_a), (2, t_b)], "doc_id long, text string"
    ).write.parquet(docs_p)
    assert main(["--store", store, "--curation-store", cur,
                 "--curate-increment", docs_p]) == 0
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .orderBy("vec_id")
        .limit(8)
        .withColumn(
            "vec_id",
            F.row_number().over(Window.orderBy("vec_id")).cast("long"),
        )
    )
    ann_index_build(emb, ann_dir)
    capsys.readouterr()

    assert main(["--store", store, "--curation-store", cur,
                 "--ann-store", ann_dir, "--bind-ann"]) == 0
    bound = json.loads(capsys.readouterr().out)
    assert bound == {"bound": ann_dir, "key": "doc_id"}

    spark.createDataFrame([(1,)], "doc_id long").write.parquet(ids_p)
    assert main(["--store", store, "--curation-store", cur,
                 "--purge-docs", ids_p]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["corpus_deleted"] == 1
    assert res["ann_deleted"] == 1
    assert res["state"] == "committed"
    assert (
        read_ann_codes(spark, ann_dir)
        .filter(F.col("vec_id") == 1)
        .count()
        == 0
    )


def test_cli_heal_scrub(spark, tmp_path, capsys):
    """--heal-scrub is the full-tree maintenance lever for crashed
    scrub state: restores mid-swap trash twins anywhere in the layout
    and clears a stale _SCRUB_PENDING sentinel (per-scrub heals are
    scoped; this lever is not). Driver-side only — no Spark needed."""
    import json
    import os
    import time as _time

    from wcdimportbot_spark.operators import sinks

    path = str(tmp_path / "out")
    spark.createDataFrame(
        [(f"h{i}", i % 2) for i in range(10)],
        "text_hash string, batch_id int",
    ).write.partitionBy("batch_id").parquet(path)
    # simulate a crash between the two renames + a stale sentinel
    os.rename(
        os.path.join(path, "batch_id=1"),
        os.path.join(path, ".__doomed_batch_id=1"),
    )
    sinks._write_scrub_sentinel(
        path, {"ts": _time.time() - 2 * sinks.SCRUB_STALE_SECS}
    )
    assert main(["--store", str(tmp_path / "g"), "--heal-scrub", path]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == {"healed": path}
    assert os.path.isdir(os.path.join(path, "batch_id=1"))
    assert not os.path.exists(os.path.join(path, sinks.SCRUB_SENTINEL))
    assert sinks.read_plain_layout(spark, path).count() == 10


def test_cli_output_retention(spark, tmp_path, capsys):
    """--expire-outputs / --rotate-rejects: the operational retention
    levers for the two unbounded plain stores (gate batch_id= outputs,
    per-rule rejects logs). Driver-side only."""
    import json
    import os

    from wcdimportbot_spark.operators import sinks

    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(f"h{i}", b) for b in range(5) for i in range(2)],
        "text_hash string, batch_id int",
    ).write.partitionBy("batch_id").parquet(out)
    assert (
        main(
            ["--store", str(tmp_path / "g"), "--expire-outputs", out,
             "--keep-last", "2"]
        )
        == 0
    )
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["partitions_expired"] == 3 and rec["partitions_kept"] == 2
    spark.catalog.refreshByPath(out)
    assert sinks.read_plain_layout(spark, out).count() == 4

    store = str(tmp_path / "g2")
    rej = os.path.join(store, "rejects")
    sinks.write_rejects(
        spark.createDataFrame([("r1", "u1")], "rule string, url string"),
        rej,
    )
    for d in os.listdir(rej):
        dd = os.path.join(rej, d)
        if os.path.isdir(dd):
            for f in os.listdir(dd):
                os.utime(os.path.join(dd, f), (1, 1))
    assert (
        main(["--store", store, "--rotate-rejects", "--older-than", "60"])
        == 0
    )
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["files_removed"] >= 1 and rec["dirs_removed"] == 1
