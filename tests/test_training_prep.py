"""Training-prep operator properties (operators/training_prep.py). Oracle
equality is covered by scripts/check_oracle.py; these pin the semantic
properties the oracles cannot express."""

from pyspark.sql import functions as F

from wcdimportbot_spark.operators.training_prep import (
    hash_split,
    pack_sequences,
    quantize_embeddings_int8,
    scrub_pii,
)


def test_hash_split_is_stable_under_appends(spark):
    """The property that justifies hash splitting: adding rows never
    changes the assignment of existing rows (random/row_number splits both
    fail this)."""
    small = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(small).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())
    # rough proportions on the larger set
    from collections import Counter

    c = Counter(b.values())
    assert 820 <= c["train"] <= 960
    assert c["val"] + c["test"] == 1000 - c["train"]


def test_hash_split_salt_changes_assignment(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, salt="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, salt="s2").collect()}
    assert any(a[k] != b[k] for k in a), "salt must re-roll the split"


def test_pack_sequences_chunks_are_contiguous_per_shard(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * (i % 7 + 1)) for i in range(200)], "doc_id long, text string"
    )
    out = pack_sequences(docs, budget_tokens=16, n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        total = 0
        for r in rows:
            # chunk_first derives from the exclusive cumsum, chunk_last
            # from the inclusive one; chunks never go backwards
            assert r["chunk_first"] == total // 16
            total += r["n_tokens"]
            assert r["chunk_last"] == max(total - 1, total - r["n_tokens"]) // 16
            assert r["chunk_last"] >= r["chunk_first"]


def test_scrub_pii_counts_and_redacts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b@example.org or c@d.io thanks"),
            (2, "server 192.168.0.1 and card 4111111111111111"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert got[1]["n_emails"] == 2 and got[1]["n_ipv4"] == 0
    assert got[2]["n_ipv4"] == 1 and got[2]["n_emails"] == 0
    assert got[3]["n_emails"] == got[3]["n_ipv4"] == 0
    # redaction shortens: both the IP and the 16-digit run collapse
    assert got[2]["scrubbed_len"] < len("server 192.168.0.1 and card 4111111111111111")


def test_quantize_error_bounded_by_half_step(spark):
    """int8 symmetric quantization: |dequant - x| <= scale/2 per element,
    so mae_x1000 <= max_abs/127/2*1000 per vector."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for r in quantize_embeddings_int8(emb).collect():
        bound = r["max_abs"] / 127.0 / 2.0 * 1000.0
        assert r["mae_x1000"] <= bound + 1e-6, (r["vec_id"], r["mae_x1000"], bound)


def test_epoch_shuffle_reproducible_and_epoch_dependent(spark):
    """Same epoch -> identical permutation regardless of layout; different
    epoch -> a different order; shards partition the keyspace."""
    from wcdimportbot_spark.operators.training_prep import epoch_shuffle

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in epoch_shuffle(docs, 1).collect()}
    b = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in epoch_shuffle(docs.repartition(7), 1).collect()
    }
    assert a == b
    c = {r["doc_id"]: (r["shard"], r["pos"]) for r in epoch_shuffle(docs, 2).collect()}
    assert a != c  # a new epoch is a new permutation
    assert len(a) == 200
    assert {s for s, _ in a.values()} == set(range(8))
    # positions within each shard are 1..|shard| (a permutation, no gaps)
    from collections import Counter

    by_shard = Counter(s for s, _ in a.values())
    for shard, n in by_shard.items():
        assert sorted(p for s, p in a.values() if s == shard) == list(range(1, n + 1))


def test_write_training_shards_layout_and_order(spark, tmp_path):
    """Output layout is split=/shard= partition dirs; rows inside each
    file follow the epoch permutation; a re-run reproduces the identical
    assignment (pure function of key/salt/epoch)."""
    import os

    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators.training_prep import write_training_shards

    docs = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(300)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, epoch=1, n_shards=4)

    splits = {d.split("=")[1] for d in os.listdir(out) if d.startswith("split=")}
    assert "train" in splits and splits <= {"train", "val", "test"}

    back = spark.read.parquet(out)
    assert back.count() == 300
    # in-file order: pos must ascend within each physical file
    files = back.select(
        "pos", F.input_file_name().alias("f")
    ).toPandas()
    for f, grp in files.groupby("f"):
        assert list(grp["pos"]) == sorted(grp["pos"])
    # deterministic re-run: same (doc_id -> split, shard, pos) assignment
    first = {r["doc_id"]: (r["split"], r["shard"], r["pos"]) for r in back.collect()}
    write_training_shards(docs, out, epoch=1, n_shards=4)
    again = {
        r["doc_id"]: (r["split"], r["shard"], r["pos"])
        for r in spark.read.parquet(out).collect()
    }
    assert first == again


def test_purge_training_shards_closed_form_prune(spark, tmp_path):
    """Shard purge (the training-prep half of the purge boundary): the
    touched split=/shard= partitions come CLOSED-FORM from the doomed
    keys (zero dataset scan), untouched partitions keep their file
    inodes, an all-doomed partition dir is removed, surviving rows keep
    their pos values (gaps mark removals), absent keys swallow."""
    import os

    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators.training_prep import (
        purge_training_shards,
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(60)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, epoch=0, n_shards=16)
    back = spark.read.parquet(out)
    assign = {
        r["doc_id"]: (r["split"], r["shard"], r["pos"]) for r in back.collect()
    }
    # pick a partition with exactly one row -> purging its doc empties it
    from collections import Counter

    per_part = Counter((s, sh) for (s, sh, _p) in assign.values())
    lone = next(
        d for d, (s, sh, _p) in assign.items() if per_part[(s, sh)] == 1
    )
    # plus one doc from a multi-row partition (rewritten, not removed)
    multi = next(
        d for d, (s, sh, _p) in assign.items() if per_part[(s, sh)] >= 3
    )
    touched = {assign[lone][:2], assign[multi][:2]}

    def inodes(s, sh):
        d = os.path.join(out, f"split={s}", f"shard={sh}")
        if not os.path.isdir(d):
            return None
        return {
            f: os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    untouched_before = {
        (s, sh): inodes(s, sh)
        for (s, sh) in per_part
        if (s, sh) not in touched
    }
    doomed = spark.createDataFrame(
        [(lone,), (multi,), (10_000,)], "doc_id long"  # 10k: absent key
    )
    res = purge_training_shards(doomed, out, epoch=0)
    assert res["rows_deleted"] == 2
    assert res["partitions_removed"] == (
        1 if assign[lone][:2] != assign[multi][:2] else 0
    )
    # untouched partitions: same files, same inodes
    for (s, sh), before in untouched_before.items():
        assert inodes(s, sh) == before, (s, sh)
    # lone doc's partition is gone entirely (unless it shared with multi)
    if assign[lone][:2] != assign[multi][:2]:
        assert inodes(*assign[lone][:2]) is None
    left = spark.read.parquet(out)
    ids_left = {r["doc_id"] for r in left.collect()}
    assert ids_left == set(range(60)) - {lone, multi}
    # survivors keep their original pos (gaps, not renumbering)
    for r in left.collect():
        assert (r["split"], r["shard"], r["pos"]) == assign[r["doc_id"]]
    # purge-twice swallows
    res2 = purge_training_shards(doomed, out, epoch=0)
    assert res2 == {
        "rows_deleted": 0,
        "partitions_rewritten": 0,
        "partitions_removed": 0,
    }


def test_purge_training_shards_key_mismatch_raises(spark, tmp_path):
    """r12 ADVICE — the (split, shard) assignment is a pure function of
    the WRITER's key; a purge called with a different key would compute
    candidate partitions from the wrong column and silently miss doomed
    rows. The sidecar records the writer's key, so the mismatch must
    fail loudly (mirroring the dedup index's _record_index_params
    guard); a legacy sidecar without a recorded key skips the check."""
    import json
    import os

    import pytest

    from wcdimportbot_spark.operators.training_prep import (
        purge_training_shards,
        write_training_shards,
    )

    out = str(tmp_path / "shards")
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "item_id long, text string"
    )
    write_training_shards(docs, out, epoch=0, n_shards=4, key="item_id")
    doomed = spark.createDataFrame([(3,)], "doc_id long")
    with pytest.raises(ValueError, match="key='item_id'"):
        purge_training_shards(doomed, out)  # default key='doc_id'
    # nothing was touched by the refused purge
    assert spark.read.parquet(out).count() == 40

    # the matching key works
    res = purge_training_shards(
        spark.createDataFrame([(3,)], "item_id long"), out, key="item_id"
    )
    assert res["rows_deleted"] == 1
    assert spark.read.parquet(out).count() == 39

    # legacy sidecar (no recorded key): check skipped, purge proceeds
    side = os.path.join(out, "_SHARDS.json")
    with open(side, encoding="ascii") as f:
        payload = json.load(f)
    del payload["key"]
    with open(side, "w", encoding="ascii") as f:
        json.dump(payload, f)
    res2 = purge_training_shards(
        spark.createDataFrame([(5,)], "item_id long"), out, key="item_id"
    )
    assert res2["rows_deleted"] == 1
