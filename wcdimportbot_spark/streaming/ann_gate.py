"""Streaming ANN ingest gate: the maintained index store's add-batch
loop (operators/ann_store.ann_index_add_batch) driven from an embedding
STREAM via ``foreachBatch`` — the similarity twin of the dedup gate
(streaming/dedup_gate.py), completing the gate family (r9 verdict #4).

Each micro-batch is encoded under the FROZEN stored model (cluster
assignment + residual PQ codes) and MERGEd into the codes store through
the shared engine: insert-if-absent on ``vec_id``, APPEND-ONLY writes
(fresh codes land as new part files in their cluster partition dirs —
O(batch) bytes per micro-batch, never a store rewrite), committed under
the writer lock or, with ``protocol="optimistic"``, lock-free through
the rename arbiter so several ingest hosts can feed one index.

**Exactly-once effects with no batch-id ledger.** Spark replays a
micro-batch under the SAME batch_id, and both of the gate's effects are
idempotent under replay:

- the accepted-rows output is partitioned by ``batch_id`` and written
  with dynamic partition overwrite, so a replay overwrites exactly its
  own partition with identical rows (the dedup gate's recipe);
- the index merge is insert-if-absent on ``vec_id`` under a frozen
  model (deterministic encode), so re-adding the batch is a no-op.

Ordering (outputs before merge) is kept for family consistency, though
unlike the dedup gate neither crash window can corrupt here: the probe
side never consults the batch's own half-finished ingest — vec_id
identity, not content similarity, decides freshness.

State: NONE in the streaming engine — the index history lives in the
snapshot-versioned store, shared with the nightly build/retrain jobs
(``ann_index_build`` / ``ann_retrain``) and every concurrent probe
(``ann_index_probe`` serves the superseded snapshot until it
re-resolves; age-based retention, versioned.RETAIN_SECS, keeps its tree
alive through the micro-batch commit train).

Reference scope: beyond-reference (the bot has no vector index); this
is the training-data-pipeline composition mandated by the task brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ann_ingest_batch_fn(
    base_path: str,
    accepted_out_path: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    protocol: str | None = None,
    compact_every: int | None = None,
    mode: str = "insert",
):
    """Build the ``foreachBatch`` function for the streaming ANN ingest
    gate. Per micro-batch: optionally write the batch's rows (with
    their ``batch_id``) to the exactly-once accepted ledger, then
    encode-and-merge them into the stored index (idempotent on
    ``vec_id``; replay is a no-op).

    ``mode`` picks the merge half. ``"insert"`` (default) is
    ``ann_index_add_batch`` — correct for append streams whose re-sends
    are exact REPLAYS (identical content re-encodes identically, so
    insert-if-absent skips it). A stream that carries RE-ENCODED
    vectors for stored ids (a re-crawl/refresh feed) must use
    ``"upsert"`` (``ann_index_upsert``): under insert mode a changed
    vector whose cluster moved would be inserted NEXT TO its stale row
    (the cluster-pruned probe never sees the old one — the
    changed-content hazard on add_batch's docstring). Upsert replay is
    convergent, not no-op: a replayed batch re-replaces its own rows
    with identical content (same final state, two extra publishes).

    ``compact_every=N`` runs the codes-store compaction after every Nth
    micro-batch (keyed on ``batch_id % N``, so a replayed batch re-runs
    the same — idempotent — maintenance): append-only merges add one
    file per touched cluster per batch, and inline periodic compaction
    is the standard companion (Delta auto-OPTIMIZE) that keeps probe
    footer counts flat without a separate scheduler. A compaction that
    loses an optimistic commit race to a concurrent writer simply
    rebases — it is just another writer."""
    from wcdimportbot_spark.operators.ann_store import (
        ann_index_add_batch,
        ann_index_upsert,
        compact_ann_codes,
    )

    if mode not in ("insert", "upsert"):
        raise ValueError(f"mode must be 'insert' or 'upsert', got {mode!r}")
    merge = ann_index_add_batch if mode == "insert" else ann_index_upsert

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df.select(id_col, vec_col)
        if accepted_out_path is not None:
            (
                batch.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(accepted_out_path)
            )
        merge(
            batch, base_path, id_col=id_col, vec_col=vec_col,
            protocol=protocol,
        )
        if compact_every and batch_id % compact_every == compact_every - 1:
            compact_ann_codes(
                batch_df.sparkSession, base_path, protocol=protocol
            )

    return fn
