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
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor

from pyspark.sql import DataFrame


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
    with ThreadPoolExecutor(len(live)) as ex:
        pinned = list(
            ex.map(lambda d: d.localCheckpoint(eager=True), [d for _, d in live])
        )
    for (i, _), p in zip(live, pinned):
        out[i] = p
    return out


def pin_async(df: DataFrame) -> "Future[DataFrame]":
    """Start an eager ``localCheckpoint`` of ``df`` on a background
    thread and return the future — call ``.result()`` where the pinned
    frame is first needed.  Lets the driver build the next (independent)
    plan while this one's checkpoint job runs."""
    ex = ThreadPoolExecutor(1)
    fut = ex.submit(lambda: df.localCheckpoint(eager=True))
    ex.shutdown(wait=False)
    return fut


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
    with ThreadPoolExecutor(len(thunks)) as ex:
        futs = [ex.submit(t) for t in thunks]
        return [f.result() for f in futs]
