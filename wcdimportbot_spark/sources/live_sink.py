"""Live Wikibase write adapter (S9 live form): rate-limited, per-partition
HTTP item writer with conflict-as-success.

The reference uploads one item per HTTP write, serially, and treats a
``ModificationFailed`` duplicate as success by adopting the conflicting
QID (``crud/create.py:25-45``). The store-backed MERGE sink
(operators/sinks.py) is the batch-native restatement; this adapter is for
targeting a REAL Wikibase API from a Spark job:

- ``foreachPartition``-style execution: each partition drains through one
  lazily-created HTTP session (executor-side client pattern);
- a token-bucket rate limiter bounds each PYTHON WORKER PROCESS's request
  rate (a process-global bucket shared across that worker's tasks and
  threads, surviving worker reuse). Spark runs up to one Python worker
  per core, so the effective cluster rate is
  ``concurrent workers × requests_per_second`` — size
  ``requests_per_second`` for the TARGET API divided by expected worker
  concurrency; a 1000-task job without a limiter is a
  deniable-of-service;
- conflict-as-success: an API "already exists" answer yields the existing
  QID, same as a fresh write (exactly-once effects under retries);
- the transport is injectable (``post_fn``) and the default HTTP
  transport is gated behind an import-try, so offline environments can
  exercise every code path with a fake.

Returned mappings land in the ordinary ``cache(hash, qid)`` table, so a
live run and a store run share the idempotence machinery.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Iterator

from pyspark.sql import DataFrame


class RateLimiter:
    """Token bucket: at most ``rate`` acquisitions per second."""

    def __init__(self, rate: float, burst: int = 1):
        self.rate = float(rate)
        self.capacity = float(max(burst, 1))
        self._tokens = self.capacity
        self._last = time.monotonic()
        self._lock = threading.Lock()

    def acquire(self) -> None:
        while True:
            with self._lock:
                now = time.monotonic()
                self._tokens = min(
                    self.capacity, self._tokens + (now - self._last) * self.rate
                )
                self._last = now
                if self._tokens >= 1.0:
                    self._tokens -= 1.0
                    return
                wait = (1.0 - self._tokens) / self.rate
            time.sleep(wait)


#: one bucket per (rate, burst) per PROCESS — constructing the limiter
#: inside each task would give every concurrent task its own full bucket,
#: multiplying the real rate against the live API by the task concurrency
_PROCESS_LIMITERS: dict[tuple[float, float], RateLimiter] = {}
_PROCESS_LIMITERS_LOCK = threading.Lock()


def process_limiter(rate: float, burst: int = 1) -> RateLimiter:
    """The process-wide shared token bucket for ``(rate, burst)``. Python
    workers are reused across tasks, so the bucket also carries its fill
    level across consecutive tasks in one worker."""
    key = (float(rate), float(max(burst, 1)))
    with _PROCESS_LIMITERS_LOCK:
        limiter = _PROCESS_LIMITERS.get(key)
        if limiter is None:
            limiter = _PROCESS_LIMITERS[key] = RateLimiter(rate, burst)
        return limiter


class ConflictExists(Exception):
    """Transport-level signal: the item already exists; carries the
    existing QID (the ``ModificationFailed`` path of crud/create.py:39-45)."""

    def __init__(self, qid: str):
        super().__init__(qid)
        self.qid = qid


def default_http_post_fn(api_url: str, timeout: float = 30.0) -> Callable:
    """Real transport: POST one item entity to a Wikibase API. Gated on
    ``requests`` being importable; raises ImportError otherwise (callers
    inject a fake in offline environments)."""
    import requests  # noqa: F401 - gated import, offline envs inject post_fn

    session_holder: dict = {}

    def post(item: dict) -> str:
        sess = session_holder.setdefault("s", requests.Session())
        resp = sess.post(api_url, json=item, timeout=timeout)
        if resp.status_code == 409:  # duplicate label/hash
            existing = resp.json().get("existing_qid", "")
            raise ConflictExists(existing)
        resp.raise_for_status()
        return resp.json()["qid"]

    return post


def write_items_live(
    items: DataFrame,
    post_fn: Callable[[dict], str],
    requests_per_second: float = 5.0,
    max_retries: int = 3,
) -> DataFrame:
    """Upload every item row through ``post_fn`` and return the
    ``(hash, qid)`` mappings as a DataFrame (feed to
    ``cache_ops.merge_write_cache`` for idempotent re-runs).

    Scale notes: the rate limiter is process-global per Python worker
    (NOT per task — see :func:`process_limiter`); total cluster rate ≈
    concurrent worker processes × requests_per_second — size the limiter
    for the TARGET API divided by expected worker concurrency. Retries
    are per-item with exponential backoff; a conflict is adopted, not
    retried."""
    from pyspark.sql import types as T

    rate = requests_per_second
    out_schema = T.StructType(
        [
            T.StructField("hash", T.StringType()),
            T.StructField("qid", T.StringType()),
        ]
    )

    def upload_partition(rows: Iterator) -> Iterator[tuple]:
        limiter = process_limiter(rate, burst=max(int(rate), 1))
        for row in rows:
            item = row.asDict(recursive=True)
            attempt = 0
            while True:
                limiter.acquire()
                try:
                    qid = post_fn(item)
                    break
                except ConflictExists as conflict:
                    # conflict-as-success: adopt the existing QID
                    qid = conflict.qid
                    break
                except Exception:
                    attempt += 1
                    if attempt > max_retries:
                        raise
                    time.sleep(min(2.0**attempt * 0.1, 5.0))
            yield (item.get("hash"), qid)

    return items.rdd.mapPartitions(upload_partition).toDF(out_schema)
