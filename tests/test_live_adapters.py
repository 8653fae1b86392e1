"""Live adapters: rate-limited Wikibase HTTP sink (S9 live form) and the
SSE → spool bridge (S4 live form). Transports are injected, so every code
path runs offline."""

import json
import os
import time

from wcdimportbot_spark.sources.live_sink import (
    ConflictExists,
    RateLimiter,
    write_items_live,
)
from wcdimportbot_spark.streaming.sse_bridge import bridge_events


def test_write_items_live_conflict_adoption(spark):
    """A duplicate write adopts the existing QID (crud/create.py:39-45);
    fresh writes return the new QID; the cache mapping carries both."""
    items = spark.createDataFrame(
        [("hash1", "new item"), ("hash2", "existing item")],
        "hash string, label string",
    ).coalesce(1)

    def post_fn(item):
        if item["hash"] == "hash2":
            raise ConflictExists("QEXISTING")
        return "QNEW-" + item["hash"]

    got = {
        r["hash"]: r["qid"]
        for r in write_items_live(items, post_fn, requests_per_second=1000).collect()
    }
    assert got == {"hash1": "QNEW-hash1", "hash2": "QEXISTING"}


def test_write_items_live_retries_then_raises(spark, tmp_path):
    items = spark.createDataFrame([("h", "x")], "hash string, label string").coalesce(1)
    # post_fn runs in the executor's Python worker: count attempts through
    # the shared filesystem, not a driver-side closure
    marker = str(tmp_path / "attempts")

    def flaky(item):
        n = int(open(marker).read()) if os.path.exists(marker) else 0
        n += 1
        with open(marker, "w") as f:
            f.write(str(n))
        if n < 3:
            raise RuntimeError("transient")
        return "QOK"

    got = write_items_live(items, flaky, requests_per_second=1000).collect()
    assert [r["qid"] for r in got] == ["QOK"]
    assert int(open(marker).read()) == 3


def test_rate_limiter_bounds_rate():
    limiter = RateLimiter(rate=50, burst=1)
    t0 = time.monotonic()
    for _ in range(6):
        limiter.acquire()
    elapsed = time.monotonic() - t0
    # 6 acquisitions at 50/s with burst 1 need ≥ 5/50 s
    assert elapsed >= 0.08


def test_bridge_rolls_complete_files_and_caps(tmp_path):
    spool = str(tmp_path / "spool")
    events = [{"title": f"E{i}", "namespace": 0} for i in range(25)]
    n = bridge_events(events, spool, events_per_file=10, max_events=25)
    assert n == 25
    files = sorted(os.listdir(spool))
    assert files == [f"bridge-{i:08d}.json" for i in range(3)]
    lines = []
    for f in files:
        with open(os.path.join(spool, f), encoding="utf-8") as fh:
            lines += [json.loads(line) for line in fh if line.strip()]
    assert [e["title"] for e in lines] == [f"E{i}" for i in range(25)]
    # no half-written temp files left behind
    assert not [f for f in os.listdir(spool) if f.endswith(".tmp")]


def test_bridge_restart_never_reuses_filenames(tmp_path):
    """A restarted bridge must seed its counter past existing spool files:
    Spark's file source tracks seen filenames and will not re-read a
    replaced file, so a colliding name loses events on both sides."""
    spool = str(tmp_path / "spool")
    bridge_events([{"title": f"A{i}"} for i in range(20)], spool, events_per_file=10)
    bridge_events([{"title": f"B{i}"} for i in range(20)], spool, events_per_file=10)
    files = sorted(os.listdir(spool))
    assert files == [f"bridge-{i:08d}.json" for i in range(4)]
    titles = []
    for f in files:
        with open(os.path.join(spool, f), encoding="utf-8") as fh:
            titles += [json.loads(line)["title"] for line in fh if line.strip()]
    assert titles == [f"A{i}" for i in range(20)] + [f"B{i}" for i in range(20)]


def test_bridge_feeds_the_event_stream_pipeline(spark, tmp_path):
    """Bridged events are consumable by the same parse used by
    --import-events (one pipeline for live and replayed events)."""
    from wcdimportbot_spark.streaming.events import parse_event_stream

    spool = str(tmp_path / "spool")
    events = [
        {"server_name": "en.wikipedia.org", "namespace": 0, "title": t,
         "bot": False, "type": "edit", "ts": "2026-01-01T10:00:00.000Z"}
        for t in ("Bridged A", "Bridged B")
    ]
    bridge_events(events, spool, events_per_file=10)
    raw = spark.read.format("text").load(spool)
    parsed = parse_event_stream(raw)
    assert {r["title"] for r in parsed.select("title").collect()} == {
        "Bridged A",
        "Bridged B",
    }
