"""Concurrent eager pins — overlap independent ``localCheckpoint`` jobs.

An eager ``localCheckpoint`` blocks the driver for one Spark job *plus*
that job's whole driver-side prologue (analysis, optimization, physical
planning, AQE stage scheduling).  A delta rule that pins several
INDEPENDENT relations back-to-back therefore serializes not just the
narrow cluster jobs but the planning gaps between them — profiled on
the round-9 state at sf0.1/local[32], 40–67 % of several lifecycle
keys' wall time is driver gap, not task time.

``pin_all`` submits each pin from its own thread so the planning and
the jobs interleave — the optimization guide's "overlap independent
jobs" rule (§2.6) applied WITHIN one delta rule, the same thread-per-
unit submission :meth:`engine.IVMEngine.merge_views` already uses
across views.  Spark's scheduler and Catalyst are thread-safe (the
property merge_views relies on); job descriptions are thread-local so
UI labels stay correct.

``pin_async`` returns a future so a caller can keep CONSTRUCTING the
next relation (hundreds of py4j round-trips — pure driver latency)
while the previous one's checkpoint job runs on the cluster.

All submissions run on ONE process-wide reusable worker pool.  In
py4j's pinned-thread mode (PySpark's default) every Python thread that
talks to the JVM gets a dedicated socket plus a paired JVM thread,
released only when Python GC collects the dead thread's locals — so a
fresh ``ThreadPoolExecutor`` per delta rule costs a socket connect,
auth handshake and JVM thread create/destroy per branch, tens of
thousands of times across a bench run, and leaves a trail of
not-yet-collected JVM threads behind (guide §7.3: "hundreds of
identical client threads point at a leak").  The pool below reuses
idle workers LIFO (warm connection first) and spawns a new worker only
when none is idle — submissions never queue behind a bounded worker
count, so nested ``pin_all``/``build_all`` calls (a branch thunk that
itself pins) cannot deadlock.  No local properties are set anywhere in
this package, so worker reuse cannot leak job descriptions between
callers.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future

from pyspark.sql import DataFrame


class _Worker:
    __slots__ = ("inbox", "thread")

    def __init__(self, pool: "_SubmitPool", n: int) -> None:
        self.inbox: "queue.SimpleQueue" = queue.SimpleQueue()
        self.thread = threading.Thread(
            target=self._loop, args=(pool,), daemon=True, name=f"ivm-pin-{n}"
        )
        self.thread.start()

    def _loop(self, pool: "_SubmitPool") -> None:
        while True:
            fn, fut = self.inbox.get()
            try:
                result, exc = fn(), None
            except BaseException as e:  # delivered to the waiter below
                result, exc = None, e
            # recycle BEFORE delivering: a waiter that immediately
            # submits follow-up work finds this (now idle) warm worker
            pool._recycle(self)
            if exc is not None:
                fut.set_exception(exc)
            else:
                fut.set_result(result)


class _SubmitPool:
    """Grow-on-demand, never-queueing pool of reusable daemon workers."""

    def __init__(self) -> None:
        self._idle: "list[_Worker]" = []
        self._lock = threading.Lock()
        self._spawned = 0

    def submit(self, fn) -> "Future":
        fut: "Future" = Future()
        fut.set_running_or_notify_cancel()
        with self._lock:
            w = self._idle.pop() if self._idle else None
            if w is None:
                self._spawned += 1
                n = self._spawned
        if w is None:
            w = _Worker(self, n)
        w.inbox.put((fn, fut))
        return fut

    def _recycle(self, w: "_Worker") -> None:
        with self._lock:
            self._idle.append(w)


_POOL = _SubmitPool()


def submit(fn) -> "Future":
    """Run ``fn()`` on the shared reusable worker pool; returns a Future."""
    return _POOL.submit(fn)


def pin_all(*dfs: "DataFrame | None") -> "list[DataFrame | None]":
    """Eagerly ``localCheckpoint`` every non-None input CONCURRENTLY and
    return the pinned frames in input order (None passes through).
    Inputs must be mutually independent plans — none may consume
    another's result."""
    live = [(i, d) for i, d in enumerate(dfs) if d is not None]
    out: "list[DataFrame | None]" = list(dfs)
    if len(live) <= 1:
        for i, d in live:
            out[i] = d.localCheckpoint(eager=True)
        return out
    futs = [
        (i, _POOL.submit(lambda d=d: d.localCheckpoint(eager=True)))
        for i, d in live
    ]
    for i, f in futs:
        out[i] = f.result()
    return out


def pin_async(df: DataFrame) -> "Future[DataFrame]":
    """Start an eager ``localCheckpoint`` of ``df`` on a background
    thread and return the future — call ``.result()`` where the pinned
    frame is first needed.  Lets the driver build the next (independent)
    plan while this one's checkpoint job runs."""
    return _POOL.submit(lambda: df.localCheckpoint(eager=True))


def build_all(*thunks):
    """Run independent plan-CONSTRUCTION thunks concurrently and return
    their results in input order.

    Profiled on the round-9 state: 40–65 % of the deep lifecycle keys'
    wall time is jobless driver work — py4j round-trips plus the eager
    per-call Catalyst analysis every Dataset transformation performs.
    A delta rule that derives several INDEPENDENT branches (matched
    terms, anti terms, sequential worlds) pays that construction
    serially even though no branch reads another's result.  Each thunk
    runs on its own thread: py4j calls release the GIL at the socket
    and the JVM analyzes concurrently, so the constructions overlap the
    same way ``pin_all`` overlaps checkpoint jobs (guide §2.6 applied
    to the planning prologue itself).  A thunk that also pins (an eager
    ``localCheckpoint`` inside a branch) overlaps its job with the
    sibling constructions for free.

    Thunks must be mutually independent and must not mutate shared
    state; results keep input order, so downstream unions are
    byte-identical to the serial construction."""
    if len(thunks) <= 1:
        return [t() for t in thunks]
    futs = [_POOL.submit(t) for t in thunks]
    return [f.result() for f in futs]
