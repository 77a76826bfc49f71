"""Async query lifecycle: create / poll / page / cancel / close.

Reference: the web-tier query lifecycle (web-services/query
QueryExecutorBean.java:1058 createQueryAndNext + cancel:1574 /
close:1686, and the microservices' RunningQuery state machine):
a query is CREATED, runs asynchronously, pages stream back while it
RUNS, and cancel/close interrupt the running scan cooperatively.

Spark restatement: the async unit is a Spark JOB GROUP.  ``submit``
runs the plan's first materialization on a worker thread under
``setJobGroup(<query id>, interruptOnCancel=True)``; ``cancel`` calls
``SparkContext.cancelJobGroup`` — Spark's real cooperative-cancel
primitive, which interrupts every task of every job the query has
launched (the tserver scan-session teardown analog).  Pages come from
the planner's existing ``QueryResult.pages`` cursor; ``close`` releases
the page cursor but lets in-flight work finish, exactly the
cancel-vs-close distinction the reference draws (cancel kills the
scan, close releases the resources).
"""

from __future__ import annotations

import threading
import uuid
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame


# Driver-side materialization bound for async queries when the caller
# gives no explicit cap — mirrors the web tier's default result limit
# rather than trusting the query to be small.
DEFAULT_MAX_RESULTS = 100_000


class QueryState(str, Enum):
    CREATED = "CREATED"
    RUNNING = "RUNNING"
    FINISHED = "FINISHED"
    CANCELED = "CANCELED"
    CLOSED = "CLOSED"
    FAILED = "FAILED"


@dataclass
class AsyncQuery:
    """Handle for one submitted query (the RunningQuery analog).

    ``max_results`` bounds what the driver materializes — the planner's
    ``QueryLogic.getResultLimit`` cap applied to the async path, so a
    mistakenly-unbounded query holds at most ``max_results`` rows on
    the driver instead of the full result (QueryExecutorBean enforces
    the same cap before paging)."""
    query_id: str
    df: DataFrame
    state: QueryState = QueryState.CREATED
    error: Exception | None = None
    max_results: int | None = DEFAULT_MAX_RESULTS
    # True when the cap actually dropped rows — the reference's web
    # tier marks such pages PARTIAL; without the flag a capped result
    # is indistinguishable from a complete one.
    truncated: bool = False
    _thread: threading.Thread | None = None
    _lock: threading.Lock = field(default_factory=threading.Lock)
    _rows: list | None = None
    _cursor: int = 0

    # -- lifecycle ---------------------------------------------------

    def start(self) -> "AsyncQuery":
        """Begin async materialization under this query's job group."""
        sc = self.df.sparkSession.sparkContext

        def run():
            sc.setJobGroup(self.query_id, f"query {self.query_id}",
                           interruptOnCancel=True)
            try:
                plan = self.df
                if self.max_results is not None:
                    # fetch ONE extra row so a capped result is
                    # detectable, then trim it away
                    plan = plan.limit(self.max_results + 1)
                rows = plan.collect()
                clipped = (self.max_results is not None
                           and len(rows) > self.max_results)
                if clipped:
                    rows = rows[:self.max_results]
                with self._lock:
                    if self.state == QueryState.RUNNING:
                        self._rows = rows
                        self.truncated = clipped
                        self.state = QueryState.FINISHED
            except Exception as e:  # canceled jobs surface here
                with self._lock:
                    if self.state == QueryState.RUNNING:
                        self.state = QueryState.FAILED
                        self.error = e
            finally:
                sc.setJobGroup("", "")

        with self._lock:
            if self.state != QueryState.CREATED:
                raise RuntimeError(f"cannot start from {self.state}")
            self.state = QueryState.RUNNING
        # InheritableThread, not threading.Thread: in non-pinned-thread
        # sessions all Python threads share one JVM thread, so a plain
        # thread's setJobGroup would leak onto concurrent queries and
        # cancel() could kill an unrelated query's jobs.
        from pyspark import InheritableThread
        self._thread = InheritableThread(
            target=run, daemon=True,
            session=self.df.sparkSession)
        self._thread.start()
        return self

    def cancel(self) -> None:
        """Cooperative cancel (QueryExecutorBean.cancel): interrupt
        every running task of this query's job group."""
        with self._lock:
            if self.state in (QueryState.FINISHED, QueryState.CLOSED):
                return
            self.state = QueryState.CANCELED
        self.df.sparkSession.sparkContext.cancelJobGroup(self.query_id)

    def close(self) -> None:
        """Release the result cursor; in-flight work may finish
        (QueryExecutorBean.close — resources, not the scan)."""
        with self._lock:
            if self.state == QueryState.RUNNING:
                self._thread_join(0.0)
            self._rows = None
            self.state = QueryState.CLOSED

    # -- results -----------------------------------------------------

    def wait(self, timeout: float | None = None) -> QueryState:
        self._thread_join(timeout)
        return self.state

    def _thread_join(self, timeout: float | None) -> None:
        if self._thread is not None:
            self._thread.join(timeout)

    def next_page(self, page_size: int = 100) -> list | None:
        """Next page of results, None when exhausted — blocks until the
        async materialization completes (createQueryAndNext's 'next'
        half)."""
        self.wait()
        with self._lock:
            if self.state != QueryState.FINISHED:
                raise RuntimeError(
                    f"query {self.query_id} is {self.state}"
                    + (f": {self.error}" if self.error else ""))
            assert self._rows is not None
            if self._cursor >= len(self._rows):
                return None
            page = self._rows[self._cursor:self._cursor + page_size]
            self._cursor += page_size
            return page


def submit(df: DataFrame, query_id: str | None = None,
           max_results: int | None = DEFAULT_MAX_RESULTS) -> AsyncQuery:
    """Create + start an async query over an already-planned frame
    (QueryExecutorBean.createQueryAndNext): returns immediately with a
    RUNNING handle.  ``max_results`` caps driver materialization
    (planner ``result_limit`` value, or the module default); pass
    ``None`` only for results known to be bounded."""
    return AsyncQuery(query_id or f"q-{uuid.uuid4().hex[:12]}", df,
                      max_results=max_results).start()
