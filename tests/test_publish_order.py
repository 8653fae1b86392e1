"""The r16 compute-overlap contract: store-mutation arms may run
concurrently, but their PUBLISHES must land in the declared crash-order
(versioned.run_publish_ordered + the engines' publish_gate).

These tests pin the three properties the overlap relies on:
- publish ORDER is preserved under the overlap (bands before hashes on
  the index merge; hashes before bands on the index delete; corpus
  before both index stores in curate_increment);
- an upstream arm failure ABORTS every downstream publish (the staged
  work never becomes visible);
- run_publish_ordered itself orders completions and re-raises the
  first failure in publish order.
"""

from __future__ import annotations

import time
from unittest import mock

import pytest
from pyspark.sql import functions as F

from wcdimportbot_spark.operators import versioned


def _docs(spark, n=40, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("some document text number "),
            F.col("id"),
            F.lit(" with enough words to shingle cleanly"),
        ).alias("text"),
    )


def test_run_publish_ordered_orders_and_returns():
    order = []

    def arm0(gate):
        assert gate is None
        time.sleep(0.2)  # force arm1 to actually wait
        order.append("a0")
        return "r0"

    def arm1(gate):
        gate()
        order.append("a1")
        return "r1"

    def arm2(gate):
        gate()
        order.append("a2")
        return "r2"

    assert versioned.run_publish_ordered([arm0, arm1, arm2]) == [
        "r0",
        "r1",
        "r2",
    ]
    assert order == ["a0", "a1", "a2"]


def test_run_publish_ordered_upstream_failure_aborts_downstream():
    reached = []

    def arm0(gate):
        raise ValueError("boom upstream")

    def arm1(gate):
        gate()  # must raise — upstream failed
        reached.append("a1 published")

    with pytest.raises(ValueError, match="boom upstream"):
        versioned.run_publish_ordered([arm0, arm1])
    assert reached == []


def test_index_merge_publishes_bands_before_hashes(spark, tmp_path):
    from wcdimportbot_spark.operators import text_dedup as td

    base = str(tmp_path / "idx")
    publishes = []
    real_publish = versioned.publish

    def spy(path, version):
        publishes.append(path)
        return real_publish(path, version)

    with mock.patch.object(versioned, "publish", spy):
        td.dedup_index_merge(_docs(spark), base)
    stores = [p.rsplit("/", 1)[-1] for p in publishes]
    assert "bands" in stores and "hashes" in stores
    assert stores.index("bands") < stores.index("hashes")

    # second batch: the steady (non-bootstrap) merge path too
    publishes.clear()
    with mock.patch.object(versioned, "publish", spy):
        td.dedup_index_merge(_docs(spark, offset=100), base)
    stores = [p.rsplit("/", 1)[-1] for p in publishes]
    assert stores.index("bands") < stores.index("hashes")


def test_index_delete_publishes_hashes_before_bands(spark, tmp_path):
    from wcdimportbot_spark.operators import text_dedup as td

    base = str(tmp_path / "idx")
    td.dedup_index_merge(_docs(spark), base)
    doomed = _docs(spark, n=10).select(F.md5(F.col("text")).alias("text_hash"))

    publishes = []
    real_publish = versioned.publish

    def spy(path, version):
        publishes.append(path)
        return real_publish(path, version)

    with mock.patch.object(versioned, "publish", spy):
        res = td.dedup_index_delete(doomed, base)
    assert res["hashes_deleted"] == 10
    stores = [p.rsplit("/", 1)[-1] for p in publishes]
    assert stores.index("hashes") < stores.index("bands")


def test_increment_publishes_corpus_before_index(spark, tmp_path):
    from wcdimportbot_spark.plans import curation_nightly as cn

    base = str(tmp_path / "cur")
    publishes = []
    real_publish = versioned.publish

    def spy(path, version):
        publishes.append(path)
        return real_publish(path, version)

    with mock.patch.object(versioned, "publish", spy):
        cn.curate_increment(_docs(spark), base)
    stores = [p.rsplit("/", 1)[-1] for p in publishes]
    assert stores.index("corpus") < stores.index("bands")
    assert stores.index("bands") < stores.index("hashes")


def test_increment_index_never_publishes_when_corpus_fails(spark, tmp_path):
    """A corpus-arm failure must abort BOTH index publishes: the index
    remembering a hash whose content the corpus never accepted is the
    can-never-re-enter state the outputs-first order exists to prevent."""
    from wcdimportbot_spark.plans import curation_nightly as cn
    from wcdimportbot_spark.operators import sinks, text_dedup as td

    base = str(tmp_path / "cur")

    def exploding_merge(*a, **k):
        raise RuntimeError("corpus publish failed")

    with mock.patch.object(cn, "merge_curated_corpus", exploding_merge):
        with pytest.raises(RuntimeError, match="corpus publish failed"):
            cn.curate_increment(_docs(spark), base)
    # neither index store became visible
    assert not sinks.has_parquet_data(str(tmp_path / "cur" / "dedup_index" / "hashes"))
    assert not sinks.has_parquet_data(str(tmp_path / "cur" / "dedup_index" / "bands"))
    # and the batch is fully ingestable afterwards (no half-state)
    ann = cn.curate_increment(_docs(spark), base)
    assert ann.filter(F.col("kept")).count() == 40
