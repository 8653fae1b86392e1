"""Structured Streaming variant of the import pipeline (SURVEY §2.8).

The reference designed (and disabled) an SSE ``recentchange`` consumer with
an in-memory seen-titles set and counter-based stop conditions
(``event_stream.py``, ``event.py``). Spark restatement:

- source: ``readStream`` over any supported source (file/Kafka/socket); the
  event payload is parsed with ``from_json`` against :data:`EVENT_SCHEMA`
  (S4, F23);
- filters: language/namespace/site — stateless (P6-P8);
- dedup: ``dropDuplicates(["title"])`` **with watermark** — the reference's
  unbounded ``Set[str]`` becomes bounded state; duplicate titles arriving
  after the watermark re-process, and the idempotent MERGE sink (J4/S9)
  absorbs them (same end state);
- stop conditions / counters: ``foreachBatch`` accumulates processed counts
  and stops the query at ``max_events`` — the reference's
  ``earlier_events``/``max_events`` logic (W2/A7);
- processing: each micro-batch runs the SAME batch pipeline
  (``plans.pipeline.run_import``) via ``foreachBatch`` — one code path for
  batch and streaming.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("server_name", T.StringType()),
        T.StructField("namespace", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("bot", T.BooleanType()),
        T.StructField("type", T.StringType()),  # new|edit|log|categorize
        T.StructField("ts", T.TimestampType()),
    ]
)


def parse_event_stream(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """F23 — JSON event payloads → typed columns (event.py:26)."""
    return raw.select(
        F.from_json(F.col(value_col).cast("string"), EVENT_SCHEMA).alias("e")
    ).select("e.*")


def filter_events(
    events: DataFrame,
    language_code: str = "en",
    wikimedia_site: str = "wikipedia",
    namespace: int = 0,
) -> DataFrame:
    """P6-P8 — site/language/namespace filters (event.py:57-61): keep
    main-namespace edits on ``{lang}.{site}.org``."""
    return events.filter(
        (F.col("server_name") == f"{language_code}.{wikimedia_site}.org")
        & (F.col("namespace") == namespace)
        & F.col("type").isin("new", "edit")
    )


def dedup_titles_with_watermark(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """W2 — first-occurrence-per-title with bounded state. The reference
    keeps an unbounded in-memory set (event_stream.py:51-54); the
    watermark bounds it.

    ``dropDuplicatesWithinWatermark``, NOT ``dropDuplicates``: plain
    ``dropDuplicates(["title"])`` only evicts state when the event-time
    column is among the dedup keys — keyed on title alone its state set
    grows with the title universe, which is exactly the reference's
    unbounded-set failure re-created inside the state store (ADVICE r8).
    The WithinWatermark variant expires each title's entry once the
    watermark passes ``ts + delay``, so state is genuinely O(titles seen
    within one watermark window).

    Late-data contract (pinned empirically by
    tests/test_streaming_sources.py::test_watermark_dedup_out_of_order):
    events WITHIN the watermark are deduped exactly, in or out of
    arrival order; events whose ts is already BEHIND the watermark are
    dropped from the stream entirely — both repeats and genuinely new
    titles. A title recurring AFTER its state expired re-emits (the
    at-least-once face of bounded state); the completeness backstop for
    both cases is the nightly batch pass over the idempotent hash-keyed
    store (operators/sinks.py MERGE): re-emits are absorbed by the
    insert-if-absent merge and too-late drops are re-deduped there, so
    the stream trades bounded state for exactness at the edges without
    corrupting the stored corpus."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["title"]
    )


def windowed_event_counts_stream(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """A7 streaming twin: tumbling-window counts per event type with a
    late-data bound. In append output a window row is emitted exactly once,
    when the watermark passes its end (the window is FINAL); events arriving
    later than the watermark are dropped from their window — the documented
    late-data policy (the batch twin ``a7_windowed_event_counts`` sees the
    full history instead). State is bounded by ``watermark``: one window per
    (window, type) newer than ``max(ts) - watermark``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            F.col("type").alias("event_type"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


@dataclass
class StreamCounters:
    """A7 — the reference's running totals (event_stream.py:26-33),
    accumulated driver-side per micro-batch."""

    events: int = 0
    batches: int = 0
    max_events: Optional[int] = None

    def exhausted(self) -> bool:
        return self.max_events is not None and self.events >= self.max_events


def run_event_stream(
    events: DataFrame,
    process_batch: Callable[[DataFrame, int], None],
    counters: StreamCounters | None = None,
    watermark: str = "10 minutes",
    checkpoint_dir: str | None = None,
    stop_poll_seconds: float = 0.1,
):
    """Wire the stream: filter → watermark dedup → foreachBatch(batch
    pipeline + counters + stop condition). Returns the StreamingQuery.

    ``max_events`` stop (event_stream.py:67-75): ``StreamingQuery.stop()``
    from inside ``foreachBatch`` deadlocks, so a daemon monitor thread
    watches the counters and stops the query after the exhausting epoch
    COMMITS. At most one extra micro-batch may race in before the stop
    lands; it is processed and counted like any other (the stateful dedup
    requires every delivered batch to be fully consumed — Spark validates
    state-store commits per epoch — and a processed-but-uncommitted batch
    would be silently lost on restart). Net contract across stop/resume:
    every event is processed exactly once, and the counter overshoots
    ``max_events`` by at most one batch (the reference likewise finishes
    work in flight before breaking out of its consumer loop)."""
    import threading

    counters = counters if counters is not None else StreamCounters()
    deduped = dedup_titles_with_watermark(filter_events(events), watermark)

    exhausted_signal = threading.Event()
    exhausting_epoch: list[int | None] = [None]

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        # every delivered batch is fully processed, even one racing the
        # stop: the stateful dedup upstream requires all partitions
        # consumed (Spark validates per-epoch state commits), and an
        # unprocessed-but-committed epoch would lose its events on resume
        n = batch_df.count()
        counters.events += n
        counters.batches += 1
        if n:
            process_batch(batch_df, epoch_id)
        if counters.exhausted():
            # signal only AFTER process_batch returns; the monitor further
            # waits for THIS epoch to commit before stopping, so the
            # exhausting batch is never replayed
            exhausting_epoch[0] = epoch_id
            exhausted_signal.set()

    writer = deduped.writeStream.outputMode("append").foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()

    if counters.max_events is not None:
        if counters.exhausted():  # pre-exhausted counters: stop immediately
            exhausted_signal.set()

        def monitor() -> None:
            import time

            while query.isActive:
                # act only on the explicit signal (set after the exhausting
                # batch fully processed) — polling counters.exhausted() here
                # would stop the query mid-batch
                if exhausted_signal.wait(timeout=stop_poll_seconds):
                    # wait (bounded) for the exhausting epoch to COMMIT:
                    # lastProgress reports the last completed micro-batch,
                    # so stopping before it covers the exhausting epoch
                    # would discard that batch's checkpoint entry and
                    # replay already-processed events on resume
                    target = exhausting_epoch[0]
                    deadline = time.monotonic() + 30.0
                    while (
                        target is not None
                        and query.isActive
                        and time.monotonic() < deadline
                    ):
                        progress = query.lastProgress
                        if progress is not None and progress["batchId"] >= target:
                            break
                        time.sleep(stop_poll_seconds)
                    query.stop()
                    return

        threading.Thread(
            target=monitor, daemon=True, name="wcd-max-events-stop"
        ).start()
    return query
