"""SSE → spool-directory bridge for the WMF EventStreams consumer (S4
live form).

The reference's (disabled) consumer holds an SSE connection to
``stream.wikimedia.org/v2/stream/recentchange`` in an infinite
reconnect-on-error loop (``event_stream.py:42-94``). Structured Streaming
has no SSE source, and the right decomposition is the one Kafka occupies
in production: a thin bridge drains the SSE firehose into a replayable
buffer, and Spark consumes the buffer with ordinary source semantics
(offset tracking, replay, backpressure).

This bridge spools events as JSON-lines files into a directory consumed
by ``spark.readStream.format("text")`` — the same entry the CLI's
``--import-events`` uses, so bridged live events and replayed dumps share
one pipeline. File rolling gives the stream source its append-only
contract (a file is named into the spool only when complete).

The HTTP/SSE transport is gated behind an import-try and injectable
(``event_iter``): offline environments bridge from any iterator of event
dicts, which is also how the tests drive it.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterable, Iterator


def sse_event_iter(
    url: str = "https://stream.wikimedia.org/v2/stream/recentchange",
    reconnect_delay: float = 1.0,
) -> Iterator[dict]:
    """Yield parsed events from an SSE endpoint, reconnecting forever on
    transport errors (event_stream.py:77-79 contract). Requires
    ``requests``; offline environments pass their own iterator instead."""
    import requests  # noqa: F401 - gated import

    while True:
        try:
            with requests.get(url, stream=True, timeout=60) as resp:
                resp.raise_for_status()
                for line in resp.iter_lines(decode_unicode=True):
                    if line and line.startswith("data:"):
                        try:
                            yield json.loads(line[5:].strip())
                        except json.JSONDecodeError:
                            continue  # partial/keepalive frame
        except Exception:
            time.sleep(reconnect_delay)


def bridge_events(
    events: Iterable[dict],
    spool_dir: str,
    events_per_file: int = 100,
    max_events: int | None = None,
    max_seconds: float | None = None,
    clock: Callable[[], float] = time.monotonic,
) -> int:
    """Drain ``events`` into ``spool_dir`` as rolled JSON-lines files.

    A file becomes visible to the streaming source only via atomic rename
    (write to ``.tmp``, then ``os.replace``) — Spark's file source lists
    completed files, so a half-written batch is never consumed. Returns
    the number of events spooled. Stop conditions mirror the reference's
    consumer: an event cap and/or a wall-clock budget.

    Restart-safe: the file counter seeds from the existing spool contents.
    Spark's file source tracks seen FILENAMES and never re-reads a
    replaced file, so a restarted bridge that reused ``bridge-00000000``
    would both destroy unconsumed events and silently drop its own — rolled
    names must never collide across runs."""
    os.makedirs(spool_dir, exist_ok=True)
    n = 0
    existing = [
        name
        for name in os.listdir(spool_dir)
        if name.startswith("bridge-") and name.endswith(".json")
    ]
    file_idx = (
        max(int(name[len("bridge-") : -len(".json")]) for name in existing) + 1
        if existing
        else 0
    )
    buf: list[str] = []
    started = clock()

    def roll() -> None:
        nonlocal file_idx, buf
        if not buf:
            return
        tmp = os.path.join(spool_dir, f".bridge-{file_idx:08d}.tmp")
        final = os.path.join(spool_dir, f"bridge-{file_idx:08d}.json")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(buf) + "\n")
        os.replace(tmp, final)
        file_idx += 1
        buf = []

    for event in events:
        buf.append(json.dumps(event, separators=(",", ":")))
        n += 1
        if len(buf) >= events_per_file:
            roll()
        if max_events is not None and n >= max_events:
            break
        if max_seconds is not None and clock() - started >= max_seconds:
            break
    roll()
    return n
