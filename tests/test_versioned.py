import pytest
"""Atomic snapshot publication (operators/versioned.py): a reader resolved
before a write keeps seeing its snapshot; a reader resolved after sees the
whole new state; the pointer flip is the only mutation readers observe."""

import os
import time

from pyspark.sql import functions as F

from wcdimportbot_spark.operators import cache as cache_ops
from wcdimportbot_spark.operators import sinks, versioned


def _items(spark, rows):
    return spark.createDataFrame(
        rows, "qid string, instance_of string, label string, description string, hash string"
    )


def test_snapshot_isolation_read_during_merge(spark, tmp_path):
    """The torn-read scenario the in-place dynamic overwrite allowed: a
    plan resolved against the store BEFORE a merge must return exactly the
    pre-merge rows AFTER the merge rewrote its partitions — never a mix,
    never FAILED_READ_FILE on deleted files."""
    path = str(tmp_path / "items")
    base = _items(
        spark, [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(8)]
    )
    sinks.write_items(base, path)

    reader_before = sinks.read_items(spark, path)  # resolves v1

    extra = _items(spark, [("Q100", "WIKIPEDIA_PAGE", "new", "d", "hash100")])
    sinks.merge_write_items(spark, extra, path)  # publishes v2

    # the pre-merge reader sees its full, immutable snapshot
    assert reader_before.count() == 8
    assert set(r["qid"] for r in reader_before.select("qid").collect()) == {
        f"Q{i}" for i in range(8)
    }
    # a fresh reader sees the complete new state
    after = sinks.read_items(spark, path)
    assert after.count() == 9


def test_time_travel_and_rollback(spark, tmp_path):
    """Within the retention window a retained older snapshot is readable
    by name (VERSION AS OF), rollback atomically repoints the table at
    it, a forward merge after rollback works, and a pruned / unknown
    version raises with the retained list."""
    import pytest

    path = str(tmp_path / "items")
    base = _items(
        spark, [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(4)]
    )
    sinks.write_items(base, path)  # v1
    sinks.merge_write_items(
        spark, _items(spark, [("Q100", "WIKIPEDIA_PAGE", "new", "d", "hash100")]), path
    )  # v2
    vs = versioned.list_versions(path)
    assert vs == ["v00000001", "v00000002"]
    # time travel: the older retained snapshot is readable by name
    old = sinks.read_snapshot(spark, path, version="v00000001")
    assert old.count() == 4
    assert sinks.read_items(spark, path).count() == 5
    # rollback: current repoints to v1; the bad merge's rows are gone
    versioned.rollback(path, "v00000001")
    assert versioned.current_version(path) == "v00000001"
    assert sinks.read_items(spark, path).count() == 4
    # forward publish after rollback re-stages v2 cleanly
    sinks.merge_write_items(
        spark, _items(spark, [("Q200", "WIKIPEDIA_PAGE", "other", "d", "hash200")]), path
    )
    qids = {r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()}
    assert qids == {f"Q{i}" for i in range(4)} | {"Q200"}  # no Q100 resurrection
    # unknown / pruned versions fail loudly with the retained list
    with pytest.raises(ValueError, match="retained"):
        sinks.read_snapshot(spark, path, version="v00000099")
    with pytest.raises(ValueError, match="retained"):
        versioned.rollback(path, "v00000099")


def test_merge_hardlinks_untouched_files(spark, tmp_path):
    """Files of partitions the merge does not touch must be hardlinks of
    the previous version (same inode — no data copied)."""
    path = str(tmp_path / "items")
    rows = [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(64)]
    sinks.write_items(_items(spark, rows), path)
    v1 = versioned.data_dir(path)

    def inodes(base):
        out = {}
        for root, _d, files in os.walk(base):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[os.path.relpath(p, base)] = os.stat(p).st_ino
        return out

    before = inodes(v1)
    sinks.merge_write_items(
        spark, _items(spark, [("Q900", "WEBSITE_ITEM", "w", "d", "hash900")]), path
    )
    v2 = versioned.data_dir(path)
    assert v2 != v1
    after = inodes(v2)
    shared = {p for p in before if after.get(p) == before[p]}
    assert shared, "untouched partitions must be hardlinked, not rewritten"
    # 64 hashes spread over WIKIPEDIA_PAGE buckets; the merge touched only
    # WEBSITE_ITEM partitions, so every page file must be shared
    assert all(p in shared for p in before if "instance_of=WIKIPEDIA_PAGE" in p)


def _parquet_inodes(base):
    out = {}
    for root, _d, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[os.path.relpath(p, base)] = os.stat(p).st_ino
    return out


def test_merge_write_cost_is_o_batch(spark, tmp_path):
    """r9 verdict #1 (the weak): insert-only MERGE must be APPEND-ONLY —
    every base file survives into the next version as a hardlink (same
    relpath, same inode), INCLUDING files of partitions the batch
    touches, and the new version gains at most ONE new file per touched
    partition. Pinned at two batch sizes, the second larger than
    N_BUCKETS so the old union-rewrite form would have rewritten ~every
    bucket."""
    path = str(tmp_path / "items")
    rows = [
        (f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(256)
    ]
    sinks.write_items(_items(spark, rows), path)
    before = _parquet_inodes(versioned.data_dir(path))
    n_parts_before = len({os.path.dirname(p) for p in before})
    assert n_parts_before >= sinks.N_BUCKETS  # all buckets populated

    start = 1000
    for batch_size in (1, 3 * sinks.N_BUCKETS):
        batch = _items(
            spark,
            [
                (f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}")
                for i in range(start, start + batch_size)
            ],
        )
        sinks.merge_write_items(spark, batch, path)
        after = _parquet_inodes(versioned.data_dir(path))
        # append-only: every pre-merge file survives verbatim (hardlink)
        missing = [p for p, ino in before.items() if after.get(p) != ino]
        assert not missing, f"base files rewritten, not linked: {missing[:5]}"
        # O(batch) writes: at most one new file per touched partition
        new_files = [p for p in after if p not in before]
        touched = {os.path.dirname(p) for p in new_files}
        assert len(touched) <= min(batch_size, sinks.N_BUCKETS)
        assert len(new_files) == len(touched), (
            "one appended file per touched partition expected"
        )
        before = after
        start += batch_size
    # content is still exactly base ∪ batches
    assert sinks.read_items(spark, path).count() == 256 + 1 + 3 * sinks.N_BUCKETS


def test_noop_merge_publishes_no_version(spark, tmp_path):
    path = str(tmp_path / "items")
    base = _items(spark, [("Q1", "WIKIPEDIA_PAGE", "p", "d", "hash1")])
    sinks.write_items(base, path)
    v = versioned.current_version(path)
    sinks.merge_write_items(spark, base, path)  # same hash: nothing fresh
    assert versioned.current_version(path) == v


def test_publish_is_pointer_flip_and_prunes(spark, tmp_path, monkeypatch):
    """Count-based pruning (age floor disabled): beyond KEEP_VERSIONS,
    superseded snapshots are deleted at publish time."""
    monkeypatch.setattr(versioned, "RETAIN_SECS", 0.0)
    path = str(tmp_path / "cache")
    df = spark.createDataFrame([("h1", "Q1")], "hash string, qid string")
    cache_ops.write_cache(df, path)
    cache_ops.write_cache(df.union(spark.createDataFrame([("h2", "Q2")], df.schema)), path)
    cache_ops.write_cache(df, path)
    versions = sorted(d for d in os.listdir(path) if versioned.is_version_name(d))
    assert len(versions) == versioned.KEEP_VERSIONS
    assert versioned.current_version(path) == versions[-1]
    assert cache_ops.read_cache(spark, path).count() == 1


def test_retention_age_floor_protects_readers(spark, tmp_path, monkeypatch):
    """r9 verdict #3: a seconds-old superseded snapshot must SURVIVE a
    rapid commit train (age floor), so an external reader that resolved
    it can finish its scan; once past the floor, the count bound prunes
    as before. Also pins the read_snapshot retry contract: a reader
    resolving mid-train gets a usable snapshot, never a torn error."""
    monkeypatch.setattr(versioned, "RETAIN_SECS", 600.0)
    path = str(tmp_path / "cache")
    df = spark.createDataFrame([("h1", "Q1")], "hash string, qid string")
    cache_ops.write_cache(df, path)
    # reader resolves v1 NOW; KEEP_VERSIONS more commits land under it
    pinned = sinks.read_snapshot(spark, path, version="v00000001")
    for i in range(2, 2 + versioned.KEEP_VERSIONS + 1):
        cache_ops.merge_write_cache(
            spark,
            spark.createDataFrame([(f"h{i}", f"Q{i}")], df.schema),
            path,
        )
    # v1 is beyond the count bound but younger than the age floor:
    # retained, and the pinned reader's scan still completes
    assert "v00000001" in versioned.list_versions(path)
    assert pinned.count() == 1
    # age the old versions out: next publish prunes them
    now = time.time()
    for v in versioned.list_versions(path)[:-1]:
        os.utime(os.path.join(path, v), (now - 7200, now - 7200))
    cache_ops.merge_write_cache(
        spark, spark.createDataFrame([("hz", "Qz")], df.schema), path
    )
    assert "v00000001" not in versioned.list_versions(path)
    # everything merged is still present in the current snapshot
    n = 2 + versioned.KEEP_VERSIONS + 1  # h1 + train + hz
    assert cache_ops.read_cache(spark, path).count() == n


def test_legacy_unversioned_store_migrates(spark, tmp_path):
    """A store written before versioning (partition dirs at the root, no
    _CURRENT) must stay readable, and its first merge publishes a proper
    snapshot version."""
    path = str(tmp_path / "items")
    legacy = sinks.with_bucket(
        _items(spark, [("Q1", "WIKIPEDIA_PAGE", "p", "d", "hash1")]), "hash"
    )
    legacy.write.mode("overwrite").partitionBy("instance_of", sinks.BUCKET_COL).parquet(
        path
    )
    assert versioned.current_version(path) is None
    assert sinks.read_items(spark, path).count() == 1

    sinks.merge_write_items(
        spark, _items(spark, [("Q2", "WEBSITE_ITEM", "w", "d", "hash2")]), path
    )
    assert versioned.current_version(path) is not None
    assert sinks.read_items(spark, path).count() == 2


def test_crashed_stage_does_not_leak_into_next_attempt(spark, tmp_path):
    """A writer that crashed after staging (unpublished version dir with
    partial files) must not contaminate the next write: stage_new clears
    the orphan before reuse."""
    path = str(tmp_path / "items")
    sinks.write_items(
        _items(spark, [("Q1", "WIKIPEDIA_PAGE", "p", "d", "hash1")]), path
    )
    # simulate a crashed merge: the next version dir exists, half-written
    cur = versioned.current_version(path)
    orphan = os.path.join(path, f"v{int(cur[1:]) + 1:08d}")
    os.makedirs(os.path.join(orphan, "instance_of=WIKIPEDIA_PAGE", "hb=0"))
    with open(
        os.path.join(orphan, "instance_of=WIKIPEDIA_PAGE", "hb=0", "stale.parquet"),
        "wb",
    ) as f:
        f.write(b"not a real parquet footer")

    sinks.merge_write_items(
        spark, _items(spark, [("Q2", "WEBSITE_ITEM", "w", "d", "hash2")]), path
    )
    df = sinks.read_items(spark, path)
    assert df.count() == 2  # stale file neither counted nor breaking the read


def test_writer_lock_blocks_live_holder_and_steals_dead(tmp_path):
    """One writer at a time: a second acquisition under a LIVE holder pid
    times out; a lock left by a DEAD pid is stolen so a crashed writer
    never wedges the store."""
    import pytest

    path = str(tmp_path / "store")
    with versioned.writer_lock(path):
        lock = os.path.join(path, versioned.LOCK_FILE)
        assert os.path.exists(lock)
        with pytest.raises(TimeoutError):
            with versioned.writer_lock(path, timeout=0.3):
                pass
    # released on exit
    assert not os.path.exists(lock)

    # stale lock from a dead pid (use an impossible pid)
    with open(lock, "w", encoding="ascii") as f:
        f.write("99999999")
    with versioned.writer_lock(path, timeout=1.0):
        with open(lock, encoding="ascii") as f:
            assert f.read() == str(os.getpid())
    assert not os.path.exists(lock)


def test_writer_lock_file_not_hardlinked_into_snapshots(spark, tmp_path):
    path = str(tmp_path / "items")
    sinks.write_items(
        _items(spark, [("Q1", "WIKIPEDIA_PAGE", "p", "d", "hash1")]), path
    )
    # leave a lock behind (simulating an in-flight writer elsewhere), then
    # merge: the staged snapshot must not inherit the lock file
    sinks.merge_write_items(
        spark, _items(spark, [("Q2", "WEBSITE_ITEM", "w", "d", "hash2")]), path
    )
    cur = versioned.current_version(path)
    assert versioned.LOCK_FILE not in os.listdir(os.path.join(path, cur))


@pytest.mark.slow
def test_multiwriter_merge_serializes_across_processes(spark, tmp_path):
    """Two OS processes race merge_write_items into ONE store. The writer
    lock must serialize the whole read->merge->publish sequence: no lost
    rows (both writers' items land), and every mid-race read sees either
    none or ALL of a writer's set (snapshot atomicity), never a partial."""
    import subprocess
    import sys
    import time

    path = str(tmp_path / "items")
    base_qids = {f"Q{i}" for i in range(4)}
    sinks.write_items(
        _items(
            spark,
            [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"base{i}") for i in range(4)],
        ),
        path,
    )

    child = tmp_path / "writer_child.py"
    child.write_text(
        'import os, sys, time\n'
        'sys.path.insert(0, "/root/repo")\n'
        'os.environ.setdefault("PYTHONPATH", "/root/repo")\n'
        'tag, store, ready, go = sys.argv[1:5]\n'
        'from pyspark.sql import SparkSession\n'
        'spark = (SparkSession.builder.master("local[2]")\n'
        '         .appName("stress-writer-" + tag)\n'
        '         .config("spark.sql.shuffle.partitions", "4")\n'
        '         .config("spark.ui.enabled", "false")\n'
        '         .getOrCreate())\n'
        'from wcdimportbot_spark.operators import sinks\n'
        'rows = [(tag + str(i), "WIKIPEDIA_PAGE", tag + "-p" + str(i), "d",\n'
        '         "hash-" + tag + str(i)) for i in range(6)]\n'
        'df = spark.createDataFrame(rows, "qid string, instance_of string, '
        'label string, description string, hash string")\n'
        'df.count()\n'
        'open(ready, "w").write("ready")\n'
        'while not os.path.exists(go):\n'
        '    time.sleep(0.02)\n'
        'sinks.merge_write_items(spark, df, store)\n'
        'spark.stop()\n'
    )
    go = tmp_path / "go"
    procs, readies = [], []
    for tag in ("A", "B"):
        ready = tmp_path / f"ready-{tag}"
        readies.append(ready)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(child), tag, path, str(ready), str(go)],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    deadline = time.time() + 240
    while not all(r.exists() for r in readies):
        assert time.time() < deadline, "writer children failed to boot"
        assert all(p.poll() is None for p in procs), "writer child died pre-race"
        time.sleep(0.2)
    go.write_text("go")  # both children start merging at once

    a_set = {f"A{i}" for i in range(6)}
    b_set = {f"B{i}" for i in range(6)}
    while any(p.poll() is None for p in procs) and time.time() < deadline:
        try:
            qids = {
                r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()
            }
        except Exception:
            # documented staleness bound: a snapshot resolved
            # KEEP_VERSIONS publishes ago may be pruned mid-read;
            # re-resolving is the reader contract
            continue
        assert qids & a_set in (set(), a_set), f"partial writer-A state: {qids}"
        assert qids & b_set in (set(), b_set), f"partial writer-B state: {qids}"
        assert base_qids <= qids
        time.sleep(0.25)

    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err.decode(errors="replace")[-3000:]
    final = {r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()}
    assert final == base_qids | a_set | b_set, "lost update across writers"


def test_rollback_never_reuses_retained_version_names(spark, tmp_path):
    """The immutable-snapshot contract across rollback: after rolling
    back over v2, a forward publish must stage v3 (max+1), NOT re-stage
    v2 — a time-travel reader holding read_snapshot(version='v00000002')
    keeps an untouched tree, and the rolled-back-over rows stay readable
    by name until normal pruning ages them out."""
    path = str(tmp_path / "items")
    sinks.write_items(
        _items(spark, [("Q1", "WIKIPEDIA_PAGE", "p1", "d", "hash1")]), path
    )  # v1
    sinks.merge_write_items(
        spark, _items(spark, [("Q100", "WIKIPEDIA_PAGE", "bad", "d", "hash100")]), path
    )  # v2 (the "bad merge")
    versioned.rollback(path, "v00000001")
    time_traveler = sinks.read_snapshot(spark, path, version="v00000002")
    sinks.merge_write_items(
        spark, _items(spark, [("Q200", "WEBSITE_ITEM", "w", "d", "hash200")]), path
    )  # must publish v3, numbering PAST the retained v2
    assert versioned.current_version(path) == "v00000003"
    assert "v00000002" in versioned.list_versions(path)
    # the held snapshot's tree was never deleted or rewritten mid-read
    assert {r["qid"] for r in time_traveler.select("qid").collect()} == {"Q1", "Q100"}
    # current state: rollback undid Q100, forward merge added Q200
    assert {r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()} == {
        "Q1",
        "Q200",
    }


def test_staging_dirs_invisible_to_readers_and_swept(spark, tmp_path):
    """A crashed writer's partial *.staging tree must never be listed as
    a retained version (rollback onto a partial tree would expose torn
    state) and is swept by the next writer's stage_new."""
    path = str(tmp_path / "items")
    sinks.write_items(
        _items(spark, [("Q1", "WIKIPEDIA_PAGE", "p1", "d", "hash1")]), path
    )
    orphan = os.path.join(path, "v00000002" + versioned.STAGING_SUFFIX)
    os.makedirs(os.path.join(orphan, "instance_of=WIKIPEDIA_PAGE"))
    with open(os.path.join(orphan, "instance_of=WIKIPEDIA_PAGE", "part.parquet"), "wb") as f:
        f.write(b"partial")
    assert versioned.list_versions(path) == ["v00000001"]
    assert versioned.data_dir(path).endswith("v00000001")
    sinks.merge_write_items(
        spark, _items(spark, [("Q2", "WEBSITE_ITEM", "w", "d", "hash2")]), path
    )
    assert not os.path.exists(orphan)
    assert versioned.list_versions(path) == ["v00000001", "v00000002"]
    assert sinks.read_items(spark, path).count() == 2


def _spawn_stage_crash_child(tmp_path, store, mode):
    import subprocess
    import sys

    child = tmp_path / "crash_child.py"
    child.write_text(
        "import os, sys, time\n"
        'sys.path.insert(0, "/root/repo")\n'
        "store, marker, mode = sys.argv[1:4]\n"
        "from wcdimportbot_spark.operators import versioned\n"
        "ctx = versioned.writer_lock(store)\n"
        "ctx.__enter__()  # SIGKILL'd before exit: lock left behind, pid dead\n"
        "version, vdir = versioned.stage_new(store)\n"
        'if mode == "midlink":\n'
        "    # emulate dying inside link_tree: link exactly one file\n"
        "    src = versioned.data_dir(store)\n"
        "    for root, dirs, files in os.walk(src):\n"
        "        if files:\n"
        "            rel = os.path.relpath(root, src)\n"
        "            out = vdir if rel == '.' else os.path.join(vdir, rel)\n"
        "            os.makedirs(out, exist_ok=True)\n"
        "            os.link(os.path.join(root, files[0]), os.path.join(out, files[0]))\n"
        "            break\n"
        "else:\n"
        "    versioned.link_tree(versioned.data_dir(store), vdir)\n"
        'open(marker, "w").write(version)\n'
        "time.sleep(600)  # parent SIGKILLs us here, before publish\n"
    )
    marker = tmp_path / f"staged-{mode}"
    proc = subprocess.Popen([sys.executable, str(child), store, str(marker), mode])
    return proc, marker


def test_writer_killed_between_stage_and_publish_recovers(spark, tmp_path):
    """VERDICT r7 #5: SIGKILL a writer after staging (both kill points —
    full tree staged, and mid-link_tree) but before publish. Readers must
    keep seeing the old snapshot, the dead writer's partial stage must be
    invisible, and the next writer must steal the dead lock, sweep the
    orphan, and publish cleanly."""
    import signal
    import time

    path = str(tmp_path / "items")
    sinks.write_items(
        _items(spark, [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(3)]),
        path,
    )
    for mode in ("afterstage", "midlink"):
        proc, marker = _spawn_stage_crash_child(tmp_path, path, mode)
        deadline = time.time() + 120
        while not marker.exists():
            assert time.time() < deadline, f"crash child ({mode}) never staged"
            assert proc.poll() is None, f"crash child ({mode}) died early"
            time.sleep(0.05)
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
        # old snapshot intact, partial stage invisible
        assert versioned.current_version(path) is not None
        assert sinks.read_items(spark, path).count() >= 3
        staged_name = marker.read_text()
        assert staged_name not in versioned.list_versions(path)
        # dead pid's lock is stolen; orphan staging tree is swept; the
        # recovery write publishes and reads back complete
        sinks.merge_write_items(
            spark,
            _items(spark, [(f"R-{mode}", "WEBSITE_ITEM", "w", "d", f"hash-{mode}")]),
            path,
        )
        assert not os.path.exists(
            os.path.join(path, staged_name + versioned.STAGING_SUFFIX)
        )
        qids = {r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()}
        assert f"R-{mode}" in qids and {"Q0", "Q1", "Q2"} <= qids


def _data_files_per_partition(path):
    """{partition-dir-relpath: n parquet files} for the CURRENT snapshot."""
    base = versioned.data_dir(path)
    out = {}
    for root, dirs, files in os.walk(base):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n:
            out[os.path.relpath(root, base)] = n
    return out


def test_compaction_merges_small_files_preserving_content(spark, tmp_path):
    """After N incremental merges a partition holds N small files;
    compact_items rewrites the multi-file partitions into one sorted
    file each as a NEW snapshot, with identical table content, while a
    reader pinned to the pre-compaction version keeps its files."""
    path = str(tmp_path / "items")
    for batch in range(3):
        rows = [
            (f"Q{batch}_{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"h{batch}_{i}")
            for i in range(40)
        ]
        sinks.merge_write_items(spark, _items(spark, rows), path)
    before_files = _data_files_per_partition(path)
    assert max(before_files.values()) >= 2  # fragmentation really happened
    before_rows = sorted(
        tuple(r) for r in sinks.read_items(spark, path).drop("hb").collect()
    )
    v_before = versioned.current_version(path)

    res = sinks.compact_items(spark, path)
    assert res["compacted_partitions"] > 0
    assert res["files_before"] >= res["compacted_partitions"] * 2

    after_files = _data_files_per_partition(path)
    assert max(after_files.values()) == 1  # every partition now one file
    after_rows = sorted(
        tuple(r) for r in sinks.read_items(spark, path).drop("hb").collect()
    )
    assert after_rows == before_rows  # content byte-identical
    assert versioned.current_version(path) != v_before
    # time travel: the fragmented snapshot is still fully readable
    pinned = sinks.read_snapshot(spark, path, version=v_before)
    assert sorted(tuple(r) for r in pinned.drop("hb").collect()) == before_rows


def test_compaction_is_idempotent_and_lookup_sorted(spark, tmp_path):
    """A second compact publishes NOTHING (version unchanged); the
    compacted files keep the hash sort that row-group pruning needs."""
    path = str(tmp_path / "items")
    for batch in range(2):
        rows = [
            (f"Q{batch}_{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"h{batch}_{i}")
            for i in range(30)
        ]
        sinks.merge_write_items(spark, _items(spark, rows), path)
    assert sinks.compact_items(spark, path)["compacted_partitions"] > 0
    v = versioned.current_version(path)
    assert sinks.compact_items(spark, path) == {
        "compacted_partitions": 0,
        "files_before": 0,
    }
    assert versioned.current_version(path) == v
    # per-file sortedness: within every parquet file, hash is ascending
    import pyarrow.parquet as pq

    base = versioned.data_dir(path)
    checked = 0
    for root, _dirs, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet"):
                col = pq.read_table(os.path.join(root, f), columns=["hash"])
                vals = col.column("hash").to_pylist()
                assert vals == sorted(vals)
                checked += 1
    assert checked > 0


def test_compaction_races_merge_without_losing_rows(spark, tmp_path):
    """A compactor process loops compact_items while this process keeps
    merging new batches into the same store. The shared writer lock
    serializes layout rewrites against merges: no batch's rows are ever
    lost, mid-race reads stay snapshot-atomic, and the final table holds
    every row exactly once."""
    import subprocess
    import sys
    import time

    path = str(tmp_path / "items")
    sinks.write_items(
        _items(
            spark,
            [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"base{i}") for i in range(30)],
        ),
        path,
    )

    child = tmp_path / "compactor_child.py"
    child.write_text(
        'import os, sys, time\n'
        'sys.path.insert(0, "/root/repo")\n'
        'os.environ.setdefault("PYTHONPATH", "/root/repo")\n'
        'store, ready, go = sys.argv[1:4]\n'
        'from pyspark.sql import SparkSession\n'
        'spark = (SparkSession.builder.master("local[2]")\n'
        '         .appName("stress-compactor")\n'
        '         .config("spark.sql.shuffle.partitions", "4")\n'
        '         .config("spark.ui.enabled", "false")\n'
        '         .getOrCreate())\n'
        'from wcdimportbot_spark.operators import sinks\n'
        'open(ready, "w").write("ready")\n'
        'while not os.path.exists(go):\n'
        '    time.sleep(0.02)\n'
        'for _ in range(3):\n'
        '    sinks.compact_items(spark, store)\n'
        '    time.sleep(0.1)\n'
        'spark.stop()\n'
    )
    ready, go = tmp_path / "ready", tmp_path / "go"
    proc = subprocess.Popen(
        [sys.executable, str(child), path, str(ready), str(go)],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    deadline = time.time() + 240
    while not ready.exists():
        assert time.time() < deadline, "compactor child failed to boot"
        assert proc.poll() is None, "compactor child died pre-race"
        time.sleep(0.2)
    go.write_text("go")

    expected = {f"Q{i}" for i in range(30)}
    for batch in range(3):
        rows = [
            (f"M{batch}_{i}", "WIKIPEDIA_PAGE", f"m{i}", "d", f"mh{batch}_{i}")
            for i in range(25)
        ]
        sinks.merge_write_items(spark, _items(spark, rows), path)
        expected |= {r[0] for r in rows}
        qids = {
            r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()
        }
        # every batch merged so far is fully present mid-race
        assert expected <= qids, f"lost rows mid-race: {expected - qids}"

    out, err = proc.communicate(timeout=240)
    assert proc.returncode == 0, err.decode()[-2000:]

    final = [r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()]
    assert set(final) == expected
    assert len(final) == len(expected)  # exactly once — no duplicated rows
    # and the store still compacts cleanly after the race
    sinks.compact_items(spark, path)
    assert {
        r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()
    } == expected


# ---------------------------------------------------------------------------
# Optimistic (lock-free) commit protocol
# ---------------------------------------------------------------------------


def test_try_publish_rename_is_commit_arbiter(tmp_path):
    """Two writers stage the SAME target number; the rename arbiter lets
    exactly one commit, the loser's staging is discarded, and the loser's
    next resolve bases on the winner's tree with the next number."""
    path = str(tmp_path / "store")
    os.makedirs(path)

    _, _, target = versioned.resolve_latest(path)
    assert target == "v00000001"
    stage_a = versioned.stage_optimistic(path, target)
    stage_b = versioned.stage_optimistic(path, target)
    assert stage_a != stage_b  # writer-unique staging names
    open(os.path.join(stage_a, "_SUCCESS"), "w").write("")
    open(os.path.join(stage_a, "a.parquet"), "w").write("A")
    open(os.path.join(stage_b, "_SUCCESS"), "w").write("")
    open(os.path.join(stage_b, "b.parquet"), "w").write("B")

    assert versioned.try_publish(path, target, stage_a) is True
    # winner's tree is live, pointer advanced
    assert versioned.list_versions(path) == ["v00000001"]
    assert versioned.current_version(path) == "v00000001"
    assert os.path.exists(os.path.join(path, "v00000001", "a.parquet"))

    assert versioned.try_publish(path, target, stage_b) is False
    # loser's staging discarded, winner's tree untouched
    assert not os.path.exists(stage_b)
    assert os.path.exists(os.path.join(path, "v00000001", "a.parquet"))
    assert not os.path.exists(os.path.join(path, "v00000001", "b.parquet"))

    # the loser rebases: next resolve sees the winner as base
    base, base_dir, nxt = versioned.resolve_latest(path)
    assert (base, nxt) == ("v00000001", "v00000002")
    assert base_dir.endswith("v00000001")


def test_advance_current_is_monotone(tmp_path):
    """Out-of-order winners: the v2 winner flips the pointer before the
    v1 winner gets scheduled — the late v1 advance must NOT regress it."""
    path = str(tmp_path / "store")
    os.makedirs(path)
    for target in ("v00000001", "v00000002"):
        d = versioned.stage_optimistic(path, target)
        open(os.path.join(d, "_SUCCESS"), "w").write("")
        assert versioned.try_publish(path, target, d)
    assert versioned.current_version(path) == "v00000002"
    versioned._advance_current(path, "v00000001")  # late, out of order
    assert versioned.current_version(path) == "v00000002"


def test_optimistic_merge_roundtrip_no_lock_file(spark, tmp_path):
    """Single-writer sanity under protocol='optimistic': first commit
    births a versioned store (never a legacy root), the second merges
    insert-if-absent, and the writer lock is never taken."""
    path = str(tmp_path / "items")
    a = _items(
        spark,
        [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"h{i}") for i in range(6)],
    )
    sinks.merge_write_items(spark, a, path, protocol="optimistic")
    assert versioned.list_versions(path) == ["v00000001"]
    assert not os.path.exists(os.path.join(path, versioned.LOCK_FILE))

    b = _items(
        spark,
        [("Q0", "WIKIPEDIA_PAGE", "dup", "d", "h0"),  # conflict: existing wins
         ("Q9", "WIKIPEDIA_PAGE", "new", "d", "h9")],
    )
    sinks.merge_write_items(spark, b, path, protocol="optimistic")
    got = {
        r["qid"]: r["label"]
        for r in sinks.read_items(spark, path).select("qid", "label").collect()
    }
    assert set(got) == {f"Q{i}" for i in range(6)} | {"Q9"}
    assert got["Q0"] == "p0"  # conflict-as-success: first write won
    assert versioned.current_version(path) == "v00000002"
    assert not os.path.exists(os.path.join(path, versioned.LOCK_FILE))


def test_optimistic_merge_rebases_after_lost_race(spark, tmp_path, monkeypatch):
    """A competitor commits BETWEEN our merge and our publish: the rename
    arbiter rejects our number, and the rebase re-merges against the
    competitor's tree — no rows lost on either side (the lost-update
    scenario the locked protocol prevents by serializing)."""
    path = str(tmp_path / "items")
    sinks.merge_write_items(
        spark,
        _items(spark, [("Q0", "WIKIPEDIA_PAGE", "p0", "d", "h0")]),
        path,
        protocol="optimistic",
    )

    orig = versioned.try_publish
    state = {"hijacked": False}

    def hijack(p, target, staged):
        if not state["hijacked"]:
            state["hijacked"] = True
            # competitor wins the target number while we hold our staging
            sinks.merge_write_items(
                spark,
                _items(spark, [("QC", "WIKIPEDIA_PAGE", "comp", "d", "hc")]),
                path,
                protocol="optimistic",
            )
        return orig(p, target, staged)

    monkeypatch.setattr(versioned, "try_publish", hijack)
    sinks.merge_write_items(
        spark,
        _items(spark, [("QM", "WIKIPEDIA_PAGE", "mine", "d", "hm")]),
        path,
        protocol="optimistic",
    )
    monkeypatch.setattr(versioned, "try_publish", orig)

    qids = {
        r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()
    }
    assert qids == {"Q0", "QC", "QM"}, "lost update across racing commits"
    # base v1, competitor v2, our rebased commit v3
    assert versioned.current_version(path) == "v00000003"


def test_optimistic_noop_merge_publishes_nothing(spark, tmp_path):
    path = str(tmp_path / "items")
    rows = _items(spark, [("Q0", "WIKIPEDIA_PAGE", "p0", "d", "h0")])
    sinks.merge_write_items(spark, rows, path, protocol="optimistic")
    sinks.merge_write_items(spark, rows, path, protocol="optimistic")
    assert versioned.list_versions(path) == ["v00000001"]


def test_optimistic_refuses_legacy_root(spark, tmp_path):
    """A pre-versioning root mixes data files with in-flight stagings in
    one directory — lock-free reads of it would be torn. The protocol
    demands the one-time locked migration instead of guessing."""
    import pytest

    path = str(tmp_path / "legacy")
    _items(spark, [("Q0", "WIKIPEDIA_PAGE", "p0", "d", "h0")]).write.parquet(
        path
    )
    with pytest.raises(ValueError, match="legacy root"):
        sinks.merge_write_items(
            spark,
            _items(spark, [("Q1", "WIKIPEDIA_PAGE", "p1", "d", "h1")]),
            path,
            protocol="optimistic",
        )


def test_restore_as_commit_republishes_old_content(spark, tmp_path):
    """Optimistic RESTORE is a forward commit (Delta RESTORE semantics):
    the pointer never regresses, so lock-free writers — whose base is the
    log max — see the restored state like any other commit."""
    path = str(tmp_path / "items")
    sinks.merge_write_items(
        spark,
        _items(spark, [("Q0", "WIKIPEDIA_PAGE", "p0", "d", "h0")]),
        path,
        protocol="optimistic",
    )
    sinks.merge_write_items(
        spark,
        _items(spark, [("Q1", "WIKIPEDIA_PAGE", "p1", "d", "h1")]),
        path,
        protocol="optimistic",
    )
    new_v = versioned.restore_as_commit(path, "v00000001")
    assert new_v == "v00000003"
    assert versioned.current_version(path) == "v00000003"
    qids = {
        r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()
    }
    assert qids == {"Q0"}  # v1 content, republished forward
    # and a later merge bases on the restore, not the rolled-back-over v2
    sinks.merge_write_items(
        spark,
        _items(spark, [("Q2", "WIKIPEDIA_PAGE", "p2", "d", "h2")]),
        path,
        protocol="optimistic",
    )
    qids = {
        r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()
    }
    assert qids == {"Q0", "Q2"}


def test_optimistic_compaction_roundtrip(spark, tmp_path):
    """Lock-free compaction: same content, one file per partition, one
    new version through the rename arbiter."""
    path = str(tmp_path / "items")
    for batch in range(3):
        rows = [
            (f"Q{batch}_{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"h{batch}_{i}")
            for i in range(8)
        ]
        sinks.merge_write_items(
            spark, _items(spark, rows), path, protocol="optimistic"
        )
    before = {
        r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()
    }
    stats = sinks.compact_store(
        spark,
        path,
        sort_key="hash",
        partitions=["instance_of", sinks.BUCKET_COL],
        protocol="optimistic",
    )
    assert stats["compacted_partitions"] > 0
    after = {
        r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()
    }
    assert after == before
    # already compact: second pass publishes nothing
    again = sinks.compact_store(
        spark,
        path,
        sort_key="hash",
        partitions=["instance_of", sinks.BUCKET_COL],
        protocol="optimistic",
    )
    assert again == {"compacted_partitions": 0, "files_before": 0}


def test_optimistic_multiwriter_stress_no_lock(spark, tmp_path):
    """Two OS processes race lock-free merges into ONE store. No writer
    lock is ever taken; the rename arbiter + rebase must deliver the same
    guarantees the locked stress test pins: no lost rows, and every
    mid-race read sees none or ALL of a writer's set."""
    import subprocess
    import sys
    import time

    path = str(tmp_path / "items")
    base_qids = {f"Q{i}" for i in range(4)}
    sinks.merge_write_items(
        spark,
        _items(
            spark,
            [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"base{i}") for i in range(4)],
        ),
        path,
        protocol="optimistic",
    )

    child = tmp_path / "opt_writer_child.py"
    child.write_text(
        'import os, sys, time\n'
        'sys.path.insert(0, "/root/repo")\n'
        'os.environ.setdefault("PYTHONPATH", "/root/repo")\n'
        'os.environ["WCD_STORE_PROTOCOL"] = "optimistic"\n'
        'tag, store, ready, go = sys.argv[1:5]\n'
        'from pyspark.sql import SparkSession\n'
        'spark = (SparkSession.builder.master("local[2]")\n'
        '         .appName("opt-writer-" + tag)\n'
        '         .config("spark.sql.shuffle.partitions", "4")\n'
        '         .config("spark.ui.enabled", "false")\n'
        '         .getOrCreate())\n'
        'from wcdimportbot_spark.operators import sinks\n'
        'rows = [(tag + str(i), "WIKIPEDIA_PAGE", tag + "-p" + str(i), "d",\n'
        '         "hash-" + tag + str(i)) for i in range(6)]\n'
        'df = spark.createDataFrame(rows, "qid string, instance_of string, '
        'label string, description string, hash string")\n'
        'df.count()\n'
        'open(ready, "w").write("ready")\n'
        'while not os.path.exists(go):\n'
        '    time.sleep(0.02)\n'
        'sinks.merge_write_items(spark, df, store)\n'
        'spark.stop()\n'
    )
    go = tmp_path / "go"
    procs, readies = [], []
    for tag in ("A", "B"):
        ready = tmp_path / f"ready-{tag}"
        readies.append(ready)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(child), tag, path, str(ready), str(go)],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    deadline = time.time() + 240
    while not all(r.exists() for r in readies):
        assert time.time() < deadline, "writer children failed to boot"
        assert all(p.poll() is None for p in procs), "writer child died pre-race"
        time.sleep(0.2)
    go.write_text("go")

    a_set = {f"A{i}" for i in range(6)}
    b_set = {f"B{i}" for i in range(6)}
    lock_file = os.path.join(path, versioned.LOCK_FILE)
    while any(p.poll() is None for p in procs) and time.time() < deadline:
        assert not os.path.exists(lock_file), "optimistic writer took the lock"
        try:
            qids = {
                r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()
            }
        except Exception:
            # same reader contract as the locked stress: a snapshot
            # resolved KEEP_VERSIONS publishes ago may prune mid-read
            continue
        assert qids & a_set in (set(), a_set), f"partial writer-A state: {qids}"
        assert qids & b_set in (set(), b_set), f"partial writer-B state: {qids}"
        assert base_qids <= qids
        time.sleep(0.25)

    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err.decode(errors="replace")[-3000:]
    final = {r["qid"] for r in sinks.read_items(spark, path).select("qid").collect()}
    assert final == base_qids | a_set | b_set, "lost update across lock-free writers"


def test_merge_probe_reads_only_touched_buckets(spark, tmp_path):
    """The anti-join's store read must reach the parquet scan as a
    PARTITION filter on the hash bucket (plan-pinned): `hb` is a
    partition column, so probing the touched buckets opens only their
    files — the read-side half of the O(batch) merge contract."""
    path = str(tmp_path / "items")
    rows = [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(64)]
    sinks.write_items(_items(spark, rows), path)
    probe = sinks.read_items(spark, path).filter(
        F.col(sinks.BUCKET_COL).isin([3, 7])
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "hb" in pf[1][:200], plan[:1500]
    # and the column-pruned anti-key projection reads ONE data column
    narrow = probe.select("hash")
    plan2 = narrow._jdf.queryExecution().executedPlan().toString()
    rs = plan2.split("ReadSchema", 1)
    assert len(rs) == 2 and "hash" in rs[1][:120] and "label" not in rs[1][:200], plan2[:1500]


def test_ann_codes_optimistic_multiwriter_stress_no_lock(spark, tmp_path):
    """r9 verdict #5's done-criterion, run against the CODES store: two
    OS processes grow one ANN index lock-free (protocol='optimistic'),
    one of them replaying its batch (at-least-once ingest). The rename
    arbiter + rebase must deliver: no lock file ever on the codes store,
    no lost vectors, no duplicate vec_ids, and every mid-race read sees
    none or ALL of a writer's batch (snapshot isolation)."""
    import subprocess
    import sys
    import time

    from wcdimportbot_spark.operators.ann_store import (
        ann_index_build,
        read_ann_codes,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = str(tmp_path / "ann")
    ann_index_build(
        emb.filter(F.col("vec_id") % 4 == 0), base, protocol="optimistic"
    )
    built_ids = {
        r["vec_id"] for r in read_ann_codes(spark, base).select("vec_id").collect()
    }
    a_ids = {r["vec_id"] for r in emb.filter(F.col("vec_id") % 4 == 1).select("vec_id").collect()}
    b_ids = {r["vec_id"] for r in emb.filter(F.col("vec_id") % 4 == 2).select("vec_id").collect()}

    child = tmp_path / "ann_writer_child.py"
    child.write_text(
        'import os, sys, time\n'
        'sys.path.insert(0, "/root/repo")\n'
        'os.environ.setdefault("PYTHONPATH", "/root/repo")\n'
        'tag, base, ready, go = sys.argv[1:5]\n'
        'rem = {"A": 1, "B": 2}[tag]\n'
        'from pyspark.sql import SparkSession, functions as F\n'
        'spark = (SparkSession.builder.master("local[2]")\n'
        '         .appName("ann-writer-" + tag)\n'
        '         .config("spark.sql.shuffle.partitions", "4")\n'
        '         .config("spark.ui.enabled", "false")\n'
        '         .getOrCreate())\n'
        'from wcdimportbot_spark.operators.ann_store import ann_index_add_batch\n'
        'batch = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")'
        '.filter(F.col("vec_id") % 4 == rem).localCheckpoint(eager=True)\n'
        'batch.count()\n'
        'open(ready, "w").write("ready")\n'
        'while not os.path.exists(go):\n'
        '    time.sleep(0.02)\n'
        'ann_index_add_batch(batch, base, protocol="optimistic")\n'
        'if tag == "A":\n'
        '    r = ann_index_add_batch(batch, base, protocol="optimistic")\n'
        '    assert r["added"] == 0, r  # replay is a no-op\n'
        'spark.stop()\n'
    )
    go = tmp_path / "go"
    procs, readies = [], []
    for tag in ("A", "B"):
        ready = tmp_path / f"ready-{tag}"
        readies.append(ready)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(child), tag, base, str(ready), str(go)],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    deadline = time.time() + 240
    while not all(r.exists() for r in readies):
        assert time.time() < deadline, "writer children failed to boot"
        assert all(p.poll() is None for p in procs), "writer child died pre-race"
        time.sleep(0.2)
    go.write_text("go")

    codes_lock = os.path.join(base, "codes", versioned.LOCK_FILE)
    while any(p.poll() is None for p in procs) and time.time() < deadline:
        assert not os.path.exists(codes_lock), "optimistic ANN writer took the lock"
        try:
            ids = {
                r["vec_id"]
                for r in read_ann_codes(spark, base).select("vec_id").collect()
            }
        except Exception:
            continue  # reader contract: re-resolve on a pruned snapshot
        assert ids & a_ids in (set(), a_ids), "partial writer-A batch visible"
        assert ids & b_ids in (set(), b_ids), "partial writer-B batch visible"
        assert built_ids <= ids
        time.sleep(0.25)

    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err.decode(errors="replace")[-3000:]
    final = read_ann_codes(spark, base)
    ids = [r["vec_id"] for r in final.select("vec_id").collect()]
    assert len(ids) == len(set(ids)), "duplicate vec_ids after replay"
    assert set(ids) == built_ids | a_ids | b_ids, "lost update across ANN writers"


# ---------------------------------------------------------------------------
# Pruned copy-on-write DELETE (r10 verdict #1 — the insert fix's twin)
# ---------------------------------------------------------------------------


def test_pruned_delete_rewrites_only_touched_buckets(spark, tmp_path):
    """Point delete must hardlink every untouched (instance_of, hb) dir
    into the new version and rewrite only the buckets holding doomed
    rows — the s10 inode contract applied to the delete side. An
    emptied partition must VANISH from the new version (the case the
    old dynamic-overwrite path could never express), and a second
    identical delete is swallowed without publishing."""
    path = str(tmp_path / "items")
    rows = [
        (f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(64)
    ] + [("Q900", "WEBSITE_ITEM", "w", "d", "hash900")]
    sinks.write_items(_items(spark, rows), path)
    before = _parquet_inodes(versioned.data_dir(path))

    doomed = spark.createDataFrame(
        [("hash0",), ("hash1",), ("hash900",)], "hash string"
    )
    touched = {
        f"instance_of={r['instance_of']}/hb={r['hb']}"
        for r in sinks.with_bucket(
            _items(spark, rows), "hash"
        )
        .join(doomed, "hash", "left_semi")
        .select("instance_of", sinks.BUCKET_COL)
        .distinct()
        .collect()
    }
    n = sinks.merge_delete_items(spark, doomed, path)
    assert n == 3
    after = _parquet_inodes(versioned.data_dir(path))
    # every untouched-dir file survives as the SAME inode; no extras
    unt_before = {p: i for p, i in before.items() if os.path.dirname(p) not in touched}
    unt_after = {p: i for p, i in after.items() if os.path.dirname(p) not in touched}
    assert unt_after == unt_before
    assert touched and len(unt_before) > 0
    # touched dirs hold only NEW files (fresh inodes) — or vanish when emptied
    before_touched_inodes = {i for p, i in before.items() if os.path.dirname(p) in touched}
    assert all(
        i not in before_touched_inodes
        for p, i in after.items()
        if os.path.dirname(p) in touched
    )
    # WEBSITE_ITEM had exactly one row: its partition must be GONE
    assert not any("instance_of=WEBSITE_ITEM" in p for p in after)
    kept = sinks.read_items(spark, path)
    assert kept.count() == 62
    assert kept.filter(F.col("hash").isin("hash0", "hash1", "hash900")).count() == 0
    # delete-twice swallowed: returns 0, publishes no new version
    v = versioned.current_version(path)
    assert sinks.merge_delete_items(spark, doomed, path) == 0
    assert versioned.current_version(path) == v


def test_pruned_delete_optimistic_and_cache(spark, tmp_path):
    """The lock-free delete twin commits through the rename arbiter (no
    lock file), and merge_delete_cache routes the KV store through the
    same engine. Absent keys are swallowed (reference tolerant delete)."""
    path = str(tmp_path / "cache")
    mappings = spark.createDataFrame(
        [(f"hash{i}", f"Q{i}") for i in range(32)], "hash string, qid string"
    )
    cache_ops.merge_write_cache(spark, mappings, path, protocol="optimistic")
    doomed = spark.createDataFrame(
        [("hash3",), ("hash7",), ("never-stored",)], "hash string"
    )
    n = cache_ops.merge_delete_cache(spark, doomed, path, protocol="optimistic")
    assert n == 2
    assert not os.path.exists(os.path.join(path, versioned.LOCK_FILE))
    left = cache_ops.read_cache(spark, path)
    assert left.count() == 30
    assert left.filter(F.col("hash").isin("hash3", "hash7")).count() == 0
    # deleting only-absent keys publishes nothing and returns 0
    v = versioned.current_version(path)
    assert (
        cache_ops.merge_delete_cache(
            spark,
            spark.createDataFrame([("ghost",)], "hash string"),
            path,
            protocol="optimistic",
        )
        == 0
    )
    assert versioned.current_version(path) == v


def test_pruned_delete_crash_before_publish_recovers(spark, tmp_path, monkeypatch):
    """Kill point: the delete stages its copy-on-write tree but dies
    before publish. Readers keep the pre-delete snapshot (doomed rows
    still visible — the delete never happened), the orphan staging is
    invisible, and re-running the delete sweeps it and converges."""
    path = str(tmp_path / "items")
    rows = [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(16)]
    sinks.write_items(_items(spark, rows), path)
    doomed = spark.createDataFrame([("hash0",), ("hash5",)], "hash string")

    real_publish = versioned.publish

    def boom(p, v):
        raise RuntimeError("killed between stage and publish")

    monkeypatch.setattr(versioned, "publish", boom)
    import pytest

    with pytest.raises(RuntimeError, match="killed"):
        sinks.merge_delete_items(spark, doomed, path)
    # crash window: store unchanged, partial stage invisible to readers
    assert versioned.current_version(path) == "v00000001"
    assert sinks.read_items(spark, path).count() == 16
    monkeypatch.setattr(versioned, "publish", real_publish)
    # recovery: rerun sweeps the orphan staging and converges
    assert sinks.merge_delete_items(spark, doomed, path) == 2
    assert sinks.read_items(spark, path).count() == 14
    assert not [
        d for d in os.listdir(path) if d.endswith(versioned.STAGING_SUFFIX)
    ]


def test_ann_index_delete_propagates(spark, tmp_path):
    """Deleting doc vectors removes their codes rows via the pruned
    engine (untouched cluster dirs hardlinked), a probe never serves a
    deleted id, and passing (vec_id, cluster) pairs skips the lookup
    scan with the same result."""
    import numpy as np

    from wcdimportbot_spark.operators.ann_store import (
        ann_index_build,
        ann_index_delete,
        ann_index_probe,
        read_ann_codes,
    )

    rng = np.random.default_rng(7)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)]) for i in range(300)],
        "vec_id long, embedding array<float>",
    ).coalesce(4)
    base = str(tmp_path / "ann")
    ann_index_build(emb, base, num_clusters=8, m=4, n_codes=16)
    codes_dir = os.path.join(base, "codes")
    before = _parquet_inodes(versioned.data_dir(codes_dir))

    # doom vectors of ONE cluster (deterministic pruning expectation:
    # exactly that cluster dir is rewritten, the other 7 hardlink through)
    all_codes = read_ann_codes(spark, base)
    doomed_rows = (
        all_codes.filter(F.col("cluster") == 0)
        .filter(F.col("vec_id") >= 50)
        .select("vec_id")
        .limit(10)
        .collect()
    )
    doomed_ids = sorted(r["vec_id"] for r in doomed_rows)
    assert doomed_ids, "cluster 0 unexpectedly empty"
    doomed = spark.createDataFrame([(i,) for i in doomed_ids], "vec_id long")
    n = ann_index_delete(doomed, base)
    assert n == len(doomed_ids)
    after = _parquet_inodes(versioned.data_dir(codes_dir))
    remaining = read_ann_codes(spark, base)
    assert remaining.count() == 300 - len(doomed_ids)
    assert remaining.filter(F.col("vec_id").isin(doomed_ids)).count() == 0
    # untouched cluster dirs hardlink through; cluster 0 is rewritten
    unt = {p: i for p, i in before.items() if "cluster=0" not in p}
    assert unt and all(after.get(p) == i for p, i in unt.items())
    c0_before = {i for p, i in before.items() if "cluster=0" in p}
    assert all(i not in c0_before for p, i in after.items() if "cluster=0" in p)
    # probe never serves a deleted id
    approx = ann_index_probe(emb, base, num_queries=5, k=3, nprobe=4, refine=5)
    assert approx.filter(F.col("neighbor_id").isin(doomed_ids)).count() == 0
    # delete-twice swallowed; pairs-with-cluster path matches
    assert ann_index_delete(doomed, base) == 0
    pairs = read_ann_codes(spark, base).select("vec_id", "cluster").filter(
        F.col("vec_id").between(200, 209)
    )
    n_pairs = pairs.count()
    assert ann_index_delete(pairs, base) == n_pairs
    assert read_ann_codes(spark, base).count() == 300 - len(doomed_ids) - n_pairs


def test_schema_evolution_additive_opt_in(spark, tmp_path):
    """Additive evolution (r10 verdict Missing #3 / Next #2): default
    merges reject ANY drift loudly; allow_additive lets a batch carry
    NEW columns — they land in fresh files only (base inodes preserved),
    the snapshot's _SCHEMA.json sidecar grows, old rows read as null.
    Missing columns still fail loudly after evolution, and compaction +
    pruned delete both preserve the evolved column (they read through
    the sidecar, never one arbitrary footer)."""
    import pytest

    path = str(tmp_path / "items")
    rows = [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(20)]
    sinks.write_items(_items(spark, rows), path)
    evolved = spark.createDataFrame(
        [(f"R{i}", "WIKIPEDIA_PAGE", f"r{i}", "d", f"ehash{i}", 0.5) for i in range(5)],
        "qid string, instance_of string, label string, description string, "
        "hash string, quality double",
    )
    with pytest.raises(ValueError, match="unexpected.*quality"):
        sinks.merge_write_items(spark, evolved, path)
    before = _parquet_inodes(versioned.data_dir(path))
    sinks.merge_write_items(spark, evolved, path, allow_additive=True)
    after = _parquet_inodes(versioned.data_dir(path))
    assert all(after.get(p) == i for p, i in before.items()), "evolution rewrote base files"
    assert os.path.exists(
        os.path.join(versioned.data_dir(path), sinks.SCHEMA_SIDECAR)
    )
    snap = sinks.read_items(spark, path)
    assert "quality" in snap.columns and snap.count() == 25
    assert snap.filter(F.col("quality").isNotNull()).count() == 5
    assert snap.filter(
        F.col("hash").startswith("hash") & F.col("quality").isNotNull()
    ).count() == 0, "pre-evolution rows must read the new column as null"
    # a batch MISSING the evolved column now fails loudly either way
    late = _items(spark, [("S1", "WIKIPEDIA_PAGE", "s", "d", "shash1")])
    with pytest.raises(ValueError, match="missing.*quality"):
        sinks.merge_write_items(spark, late, path, allow_additive=True)
    # compaction and pruned delete read through the sidecar
    sinks.compact_items(spark, path)
    snap2 = sinks.read_items(spark, path)
    assert snap2.filter(F.col("quality").isNotNull()).count() == 5
    n = sinks.merge_delete_items(
        spark, spark.createDataFrame([("ehash0",)], "hash string"), path
    )
    assert n == 1
    snap3 = sinks.read_items(spark, path)
    assert snap3.filter(F.col("quality").isNotNull()).count() == 4
    assert snap3.count() == 24


def test_schema_evolution_optimistic_and_time_travel(spark, tmp_path):
    """The lock-free twin evolves identically, and TIME TRAVEL reads a
    pre-evolution snapshot with its ORIGINAL schema (the sidecar is
    per-snapshot, exactly Delta's log-held schema per version)."""
    path = str(tmp_path / "items")
    rows = [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(8)]
    sinks.merge_write_items(spark, _items(spark, rows), path, protocol="optimistic")
    evolved = spark.createDataFrame(
        [("R1", "WIKIPEDIA_PAGE", "r", "d", "ehash1", 7)],
        "qid string, instance_of string, label string, description string, "
        "hash string, rank int",
    )
    sinks.merge_write_items(
        spark, evolved, path, protocol="optimistic", allow_additive=True
    )
    snap = sinks.read_items(spark, path)
    assert "rank" in snap.columns and snap.count() == 9
    assert snap.filter(F.col("rank").isNotNull()).count() == 1
    old = sinks.read_snapshot(spark, path, version="v00000001")
    assert "rank" not in old.columns and old.count() == 8


# ---------------------------------------------------------------------------
# Bucket-split maintenance (r10 verdict Next #5 — extendible hashing)
# ---------------------------------------------------------------------------


def test_split_bucket_rewrites_one_bucket_and_composes(spark, tmp_path):
    """Splitting a hot bucket rewrites ONLY that bucket's dirs (every
    other file hardlinks through), redistributes its rows exactly by the
    child modulus, and subsequent merges/deletes derive batch buckets
    from the snapshot's map — resends stay no-ops, fresh rows land in
    the child layout, point deletes prune under it. Children split
    again independently (per-leaf depth)."""
    path = str(tmp_path / "items")
    rows = [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(256)]
    sinks.write_items(_items(spark, rows), path)
    before = _parquet_inodes(versioned.data_dir(path))

    info = sinks.split_bucket(
        spark, path, 5, key="hash", partitions=["instance_of", sinks.BUCKET_COL]
    )
    assert info["children"] == [5, 21] and info["depth"] == 1
    after = _parquet_inodes(versioned.data_dir(path))
    unt = {p: i for p, i in before.items() if f"{sinks.BUCKET_COL}=5" not in p}
    assert unt and all(after.get(p) == i for p, i in unt.items())
    snap = sinks.read_items(spark, path)
    assert snap.count() == 256
    # redistribution is exactly the child modulus
    for child in (5, 21):
        assert (
            snap.filter(F.col(sinks.BUCKET_COL) == child)
            .filter(F.pmod(F.xxhash64(F.col("hash")), F.lit(32)) != child)
            .count()
            == 0
        )
    # merge after split: full resend + fresh rows — zero duplicates, and
    # fresh rows obey the split map
    fresh = _items(
        spark,
        [(f"R{i}", "WIKIPEDIA_PAGE", f"r{i}", "d", f"fhash{i}") for i in range(64)],
    )
    sinks.merge_write_items(spark, _items(spark, rows).unionByName(fresh), path)
    snap2 = sinks.read_items(spark, path)
    assert snap2.count() == 320
    assert snap2.select("hash").distinct().count() == 320
    assert (
        snap2.filter(F.col(sinks.BUCKET_COL) == 5)
        .filter(F.pmod(F.xxhash64(F.col("hash")), F.lit(32)) != 5)
        .count()
        == 0
    )
    # pruned delete under the split map
    assert (
        sinks.merge_delete_items(
            spark, spark.createDataFrame([("fhash0",), ("hash0",)], "hash string"), path
        )
        == 2
    )
    assert sinks.read_items(spark, path).count() == 318
    # the child splits again, independently (depth 2)
    info2 = sinks.split_bucket(
        spark, path, 21, key="hash", partitions=["instance_of", sinks.BUCKET_COL]
    )
    assert info2["children"] == [21, 53] and info2["depth"] == 2
    assert sinks.read_items(spark, path).count() == 318
    # splitting a non-leaf is refused
    import pytest

    with pytest.raises(ValueError, match="not a leaf"):
        sinks.split_bucket(
            spark, path, 999, key="hash",
            partitions=["instance_of", sinks.BUCKET_COL],
        )


def test_split_bucket_under_concurrent_merges_loses_nothing(spark, tmp_path):
    """Splits racing merges (locked protocol serializes; each writer
    re-derives the bucket map from the snapshot it merges against):
    interleaved from two threads, the final store holds exactly the
    union with zero duplicates and every row obeys the final map."""
    import threading

    path = str(tmp_path / "items")
    sinks.write_items(
        _items(
            spark,
            [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(128)],
        ),
        path,
    )
    errs = []

    def merger():
        try:
            for g in range(4):
                batch = _items(
                    spark,
                    [
                        (f"M{g}-{i}", "WIKIPEDIA_PAGE", "m", "d", f"mhash{g}-{i}")
                        for i in range(32)
                    ],
                )
                sinks.merge_write_items(spark, batch, path)
        except Exception as e:  # surface in the main thread
            errs.append(e)

    t = threading.Thread(target=merger)
    t.start()
    for b in (0, 1, 2, 3):
        sinks.split_bucket(
            spark, path, b, key="hash",
            partitions=["instance_of", sinks.BUCKET_COL],
        )
    t.join()
    assert not errs, errs
    snap = sinks.read_items(spark, path)
    assert snap.count() == 128 + 4 * 32
    assert snap.select("hash").distinct().count() == 256
    # every row sits in the bucket the FINAL map assigns it
    leaves = sinks._bucket_leaves(versioned.data_dir(path))
    assert leaves is not None and leaves[0] == 1
    misplaced = snap.withColumn(
        "_want", sinks._bucket_column("hash", leaves)
    ).filter(F.col("_want") != F.col(sinks.BUCKET_COL))
    assert misplaced.count() == 0


def test_upsert_atomic_and_prunes(spark, tmp_path, monkeypatch):
    """Full-MERGE upsert (WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT): matched rows are REPLACED in one atomic snapshot publish
    (a crash mid-upsert leaves the store fully pre-upsert — never the
    deleted-but-not-reinserted half), untouched buckets hardlink
    through, a row whose partition value changed MOVES dirs, and the
    bucket-split map composes."""
    import pytest

    path = str(tmp_path / "items")
    rows = [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(64)]
    rows.append(("Q900", "WEBSITE_ITEM", "w", "d", "hash900"))
    sinks.write_items(_items(spark, rows), path)
    before = _parquet_inodes(versioned.data_dir(path))

    batch = _items(
        spark,
        [
            ("Q0", "WIKIPEDIA_PAGE", "UPDATED", "d", "hash0"),
            # partition move: same identity, reclassified type
            ("Q1", "WIKIPEDIA_REFERENCE", "moved", "d", "hash1"),
            ("QF", "WIKIPEDIA_PAGE", "fresh", "d", "hashF"),
        ],
    )
    # crash BEFORE publish: store must stay fully pre-upsert
    def boom(p, v):
        raise RuntimeError("killed before upsert publish")

    real_publish = versioned.publish
    monkeypatch.setattr(versioned, "publish", boom)
    with pytest.raises(RuntimeError, match="killed before"):
        sinks.upsert_write_items(spark, batch, path)
    monkeypatch.setattr(versioned, "publish", real_publish)
    snap0 = sinks.read_items(spark, path)
    assert snap0.count() == 65
    assert snap0.filter(F.col("label") == "UPDATED").count() == 0

    res = sinks.upsert_write_items(spark, batch, path)
    assert res == {"updated": 2, "inserted": 1}
    after = _parquet_inodes(versioned.data_dir(path))
    touched = {
        f"instance_of={r['instance_of']}/hb={r['hb']}"
        for r in sinks.with_bucket(batch, "hash")
        .select("instance_of", sinks.BUCKET_COL)
        .distinct()
        .collect()
    } | {
        # the moved row's OLD dir is touched too
        f"instance_of=WIKIPEDIA_PAGE/hb={r['hb']}"
        for r in sinks.with_bucket(
            batch.filter(F.col("qid") == "Q1"), "hash"
        ).select(sinks.BUCKET_COL).collect()
    }
    unt = {p: i for p, i in before.items() if os.path.dirname(p) not in touched}
    assert unt and all(after.get(p) == i for p, i in unt.items())
    snap = sinks.read_items(spark, path)
    assert snap.count() == 66
    assert snap.select("hash").distinct().count() == 66
    assert snap.filter(F.col("hash") == "hash0").first()["label"] == "UPDATED"
    moved = snap.filter(F.col("hash") == "hash1").collect()
    assert len(moved) == 1 and moved[0]["instance_of"] == "WIKIPEDIA_REFERENCE"
    # composes with a split store (batch re-bucketed under the map)
    sinks.split_bucket(
        spark, path, 4, key="hash", partitions=["instance_of", sinks.BUCKET_COL]
    )
    res2 = sinks.upsert_write_items(
        spark,
        _items(spark, [("Q0", "WIKIPEDIA_PAGE", "UPDATED-2", "d", "hash0")]),
        path,
    )
    assert res2 == {"updated": 1, "inserted": 0}
    snap2 = sinks.read_items(spark, path)
    assert snap2.count() == 66
    assert snap2.filter(F.col("hash") == "hash0").first()["label"] == "UPDATED-2"
    leaves = sinks._bucket_leaves(versioned.data_dir(path))
    assert (
        snap2.withColumn("_want", sinks._bucket_column("hash", leaves))
        .filter(F.col("_want") != F.col(sinks.BUCKET_COL))
        .count()
        == 0
    )


def test_upsert_optimistic_rebases_over_concurrent_merge(spark, tmp_path):
    """Lock-free upsert converges with concurrent inserts: rows merged
    by a competitor after the upsert's first resolution are still
    replaced/kept correctly because the rebase recomputes against the
    winner's tree."""
    path = str(tmp_path / "items")
    base = _items(
        spark, [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(16)]
    )
    sinks.merge_write_items(spark, base, path, protocol="optimistic")
    batch = _items(
        spark, [("Q0", "WIKIPEDIA_PAGE", "UPDATED", "d", "hash0")]
    )
    res = sinks.upsert_write_items(spark, batch, path, protocol="optimistic")
    assert res == {"updated": 1, "inserted": 0}
    assert not os.path.exists(os.path.join(path, versioned.LOCK_FILE))
    snap = sinks.read_items(spark, path)
    assert snap.count() == 16
    assert snap.filter(F.col("hash") == "hash0").first()["label"] == "UPDATED"


def test_upsert_missing_matched_dir_raises(spark, tmp_path, monkeypatch):
    """r11 ADVICE (medium): a matched partition whose constructed
    relpath does not exist on disk is a value-escaping mismatch. The
    upsert must fail LOUDLY before staging anything — silently dropping
    it from the exclude set would hardlink the old dir AND append
    kept+batch rows for it (matched rows surviving alongside their
    replacements). Batch-only tuples may legitimately be absent."""
    import pytest

    path = str(tmp_path / "items")
    sinks.write_items(
        _items(
            spark,
            [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(8)],
        ),
        path,
    )
    v_before = versioned.current_version(path)

    real = sinks._partition_relpath

    def wrong(tuple_row, partitions):
        return real(tuple_row, partitions) + "_ESCAPED"

    monkeypatch.setattr(sinks, "_partition_relpath", wrong)
    with pytest.raises(ValueError, match="refusing an unpruned upsert"):
        sinks.upsert_write_items(
            spark,
            _items(spark, [("Q0", "WIKIPEDIA_PAGE", "UPDATED", "d", "hash0")]),
            path,
        )
    monkeypatch.setattr(sinks, "_partition_relpath", real)
    # nothing staged, nothing published, store intact
    assert versioned.current_version(path) == v_before
    snap = sinks.read_items(spark, path)
    assert snap.count() == 8
    assert snap.filter(F.col("label") == "UPDATED").count() == 0


def test_upsert_counts_distinct_matched_keys(spark, tmp_path):
    """r11 ADVICE (low): on a store whose key is NOT unique per row
    (claims-shaped), 'updated' must count matched distinct batch keys —
    counting matched STORE rows inflates it and skews 'inserted'
    negative. All matched rows are still replaced by the batch's one
    row per key (last-writer-wins within the call)."""
    path = str(tmp_path / "kv")
    df = spark.createDataFrame(
        [("k1", "a"), ("k1", "b"), ("k2", "c")], "k string, v string"
    )
    sinks.upsert_into_store(
        spark, df, path, key="k", bucket_key="k", partitions=[sinks.BUCKET_COL]
    )
    res = sinks.upsert_into_store(
        spark,
        spark.createDataFrame([("k1", "NEW"), ("k3", "x")], "k string, v string"),
        path,
        key="k",
        bucket_key="k",
        partitions=[sinks.BUCKET_COL],
    )
    # pre-fix this reported {"updated": 2, "inserted": 0}
    assert res == {"updated": 1, "inserted": 1}
    snap = sinks.read_snapshot(spark, path)
    assert snap.count() == 3
    assert [r["v"] for r in snap.filter(F.col("k") == "k1").collect()] == ["NEW"]


def test_ann_optimistic_first_commit_stamps_model(spark, tmp_path):
    """r11 ADVICE (low): a codes store BORN from an optimistic
    add-batch (build ran elsewhere / codes wiped) must still carry the
    _MODEL_VERSION stamp, or load_ann_pair silently degrades to the
    unverified current-of-each pairing the r10 fix exists to prevent."""
    import shutil

    from wcdimportbot_spark.operators.ann_store import (
        _codes_path,
        _model_path,
        _read_model_stamp,
        ann_index_add_batch,
        ann_index_build,
        read_ann_codes,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(64)
    base = str(tmp_path / "ann")
    ann_index_build(emb, base)
    mv = versioned.current_version(_model_path(base))
    # simulate "build ran elsewhere": model present, codes store absent
    shutil.rmtree(_codes_path(base))
    res = ann_index_add_batch(emb, base, protocol="optimistic")
    assert res["added"] > 0
    stamp = _read_model_stamp(versioned.data_dir(_codes_path(base)))
    assert stamp == mv, f"optimistic first commit left stamp={stamp!r}"
    assert read_ann_codes(spark, base).count() == res["added"]


def test_compaction_preserves_split_and_schema_sidecars(spark, tmp_path):
    """r11 verdict Next #3 done-criterion: compacting a store that has
    BOTH been bucket-split and schema-evolved must carry _BUCKETS.json
    and _SCHEMA.json into the compacted snapshot — a compaction that
    drops the bucket map silently mis-routes every later merge, and one
    that drops the schema sidecar makes evolved columns vanish for old
    files."""
    path = str(tmp_path / "items")
    rows = [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(64)]
    sinks.write_items(_items(spark, rows), path)
    sinks.split_bucket(
        spark, path, 3, key="hash", partitions=["instance_of", sinks.BUCKET_COL]
    )
    evolved = _items(
        spark, [("QE", "WIKIPEDIA_PAGE", "e", "d", "hashE")]
    ).withColumn("score", F.lit(1.5))
    sinks.merge_write_items(spark, evolved, path, allow_additive=True)
    want_leaves = sinks._bucket_leaves(versioned.data_dir(path))
    assert want_leaves is not None and want_leaves[3] == 1

    res = sinks.compact_items(spark, path)
    assert res["compacted_partitions"] > 0  # the merge fragmented dirs
    d = versioned.data_dir(path)
    assert sinks._bucket_leaves(d) == want_leaves
    schema = sinks._sidecar_schema(d)
    assert schema is not None and "score" in schema.names
    # both sidecars still DRIVE reads/writes: evolved col readable, a
    # resent batch routes through the split map as a no-op
    snap = sinks.read_items(spark, path)
    assert snap.filter(F.col("score").isNotNull()).count() == 1
    v = versioned.current_version(path)
    evolved2 = _items(spark, rows[:8]).withColumn(
        "score", F.lit(None).cast("double")
    )
    sinks.merge_write_items(spark, evolved2, path)
    assert versioned.current_version(path) == v  # resend = no-op
    leaves = sinks._bucket_leaves(d)
    assert (
        snap.withColumn("_want", sinks._bucket_column("hash", leaves))
        .filter(F.col("_want") != F.col(sinks.BUCKET_COL))
        .count()
        == 0
    )


def test_expire_history_vacuums_behind_current(spark, tmp_path):
    """Privacy vacuum (Delta's VACUUM sans retention check): every
    complete tree BEHIND the pointer goes regardless of KEEP_VERSIONS /
    RETAIN_SECS, the current snapshot keeps serving, and a rewritten
    file's bytes are actually gone (its last hardlink lived in the
    expired tree). Trees ABOVE the pointer — a just-committed optimistic
    winner whose _advance_current has not run — are never touched."""
    path = str(tmp_path / "items")
    sinks.write_items(
        _items(
            spark,
            [(f"Q{i}", "WIKIPEDIA_PAGE", f"p{i}", "d", f"hash{i}") for i in range(8)],
        ),
        path,
    )  # v1
    sinks.merge_write_items(
        spark, _items(spark, [("Q100", "WIKIPEDIA_PAGE", "new", "d", "hash100")]), path
    )  # v2
    n_del = sinks.merge_delete_items(
        spark, spark.createDataFrame([("hash0",)], "hash string"), path
    )  # v3: the pre-delete trees still hold hash0's bytes
    assert n_del == 1
    assert len(versioned.list_versions(path)) == 3

    # a complete tree numbered above the pointer (committed optimistic
    # winner, pointer not yet advanced) must survive the vacuum
    cur = versioned.current_version(path)
    ghost = os.path.join(path, "v00000099")
    os.makedirs(ghost)
    open(os.path.join(ghost, "_SUCCESS"), "w").close()
    # a crashed LOCKED writer's staging is swept (we hold the lock)
    crashed = os.path.join(path, "v00000007.staging")
    os.makedirs(crashed)

    removed = versioned.expire_history(path)
    assert removed == ["v00000001", "v00000002", "v00000007.staging"]
    assert os.path.isdir(ghost)
    assert versioned.current_version(path) == cur
    assert sorted(
        d for d in os.listdir(path) if versioned.is_version_name(d)
    ) == [cur, "v00000099"]

    # current snapshot intact, deleted row truly gone from disk
    snap = sinks.read_items(spark, path)
    assert snap.count() == 8  # 9 - 1 deleted
    assert snap.filter(F.col("hash") == "hash0").count() == 0
    walked = [
        f
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    ]
    assert walked  # data still on disk for the live snapshot
    # idempotent: a second vacuum finds nothing behind the pointer
    assert versioned.expire_history(path) == []
    # and an absent store is a no-op, not a mkdir
    assert versioned.expire_history(str(tmp_path / "nope")) == []
    assert not os.path.exists(str(tmp_path / "nope"))


def test_expire_history_spares_live_optimistic_staging(spark, tmp_path):
    """A racing optimistic writer's staged tree (recent file activity)
    survives the vacuum — only STALE_STAGING_SECS-old orphans are swept,
    the same liveness rule stage_optimistic itself applies."""
    path = str(tmp_path / "items")
    sinks.write_items(
        _items(spark, [("Q1", "WIKIPEDIA_PAGE", "p", "d", "h1")]), path
    )
    live = versioned.stage_optimistic(path, "v00000002")
    open(os.path.join(live, "part-live.parquet"), "w").close()
    stale = versioned.stage_optimistic(path, "v00000002")
    old = time.time() - versioned.STALE_STAGING_SECS - 10
    os.utime(stale, (old, old))

    removed = versioned.expire_history(path)
    assert os.path.basename(stale) in removed
    assert os.path.isdir(live)
    assert versioned.expire_history(path).count(os.path.basename(live)) == 0
