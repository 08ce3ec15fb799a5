"""Progress callbacks (SURVEY §2.7 O10).

The reference streams per-chunk progress to a caller-supplied callback
while a conversion drains (``convert/results.py:130-207``: chunk
completed → callback(ProgressEvent)). Spark runs the work inside the
scheduler, so the bridge inverts: a driver-side poller reads the
scheduler's own counters (``SparkContext.statusTracker()`` — job/stage
ids, completed/active task counts) and invokes the callback while the
action runs. Nothing is added to the hot path: the poller costs one
status lookup per interval on the DRIVER, zero per-row work, zero
executor instrumentation — the per-batch metrics themselves stay
relational (metrics.py), exactly as before.

For streaming queries the same surface is served natively by
``spark.streams.addListener`` (StreamingQueryListener, Python API) —
``attach_streaming_progress`` adapts it to the same callback shape.
"""

from __future__ import annotations

import threading
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class ProgressEvent:
    """One progress observation (the reference's ProgressCallbackRequest
    analog: counts, not payloads)."""

    active_stages: int
    num_tasks: int
    num_completed_tasks: int
    num_active_tasks: int
    num_failed_tasks: int
    elapsed_sec: float
    done: bool = False


def run_with_progress(
    action: Callable[[], object],
    callback: Callable[[ProgressEvent], None],
    spark,
    interval_sec: float = 0.25,
    group_id: str | None = "",
) -> object:
    """Run a driver action (count/collect/write...) while reporting
    scheduler progress to ``callback``.

    The action runs on the CALLING thread (so exceptions propagate
    unchanged and failures-are-rows semantics are untouched); a daemon
    poller thread samples the status tracker until the action returns,
    then emits one final ``done=True`` event with the end-state counts.

    ``group_id`` scopes the counters to this action's jobs via a Spark
    job group. Default ``""`` generates a unique group per call —
    setJobGroup is cheap and scoping is EXACT: without it, jobs that
    start and finish between poll samples are never seen (undercounted
    final event, zeros for sub-interval actions) and concurrent actions
    on other threads bleed into the counts. Pass ``None`` to explicitly
    opt out (active-jobs sampling, best-effort)."""
    sc = spark.sparkContext
    if group_id == "":
        group_id = f"run_with_progress-{uuid.uuid4().hex}"
    # Save the caller's thread-local job group so it can be RESTORED
    # after the action: clearing to (None, None) in the finally block
    # would silently clobber a cancellation scope the caller had set on
    # this thread before delegating to us.
    prev_group = sc.getLocalProperty("spark.jobGroup.id")
    prev_desc = sc.getLocalProperty("spark.job.description")
    prev_interrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    if group_id is not None:
        sc.setJobGroup(group_id, "run_with_progress", interruptOnCancel=False)
    tracker = sc.statusTracker()
    stop = threading.Event()
    t0 = time.perf_counter()
    # Without a job group the tracker can only enumerate ACTIVE jobs, so
    # remember every job id ever seen: otherwise counters drop as jobs
    # finish (non-monotonic mid-run) and the final done=True event —
    # taken after the action returned, when nothing is active — would
    # report all zeros instead of end-state counts.
    seen_jobs: set[int] = set()

    def snapshot(done: bool) -> ProgressEvent:
        if group_id is not None:
            job_ids = tracker.getJobIdsForGroup(group_id)
        else:
            seen_jobs.update(tracker.getActiveJobsIds())
            job_ids = sorted(seen_jobs)
        num = comp = act = fail = 0
        stages: set[int] = set()
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            stages.update(info.stageIds)
        active_stages = 0
        for sid in stages:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is None:
                continue
            num += sinfo.numTasks
            comp += sinfo.numCompletedTasks
            act += sinfo.numActiveTasks
            fail += sinfo.numFailedTasks
            if sinfo.numActiveTasks > 0:
                active_stages += 1
        return ProgressEvent(
            active_stages=active_stages,
            num_tasks=num,
            num_completed_tasks=comp,
            num_active_tasks=act,
            num_failed_tasks=fail,
            elapsed_sec=time.perf_counter() - t0,
            done=done,
        )

    def poll() -> None:
        while not stop.wait(interval_sec):
            callback(snapshot(done=False))

    poller = threading.Thread(target=poll, daemon=True)
    poller.start()
    try:
        result = action()
    finally:
        stop.set()
        poller.join(timeout=5.0)
        if group_id is not None:
            # restore, don't clear: the caller's own job group (and its
            # interrupt-on-cancel flag), if any, must survive this call
            sc.setLocalProperty("spark.jobGroup.id", prev_group)
            sc.setLocalProperty("spark.job.description", prev_desc)
            sc.setLocalProperty("spark.job.interruptOnCancel", prev_interrupt)
    callback(snapshot(done=True))
    return result


def attach_streaming_progress(
    spark, callback: Callable[[dict], None]
):
    """Streaming twin: adapt StreamingQueryListener to a plain callback
    receiving each micro-batch's progress dict (rows/sec, batch id,
    sink description — the continuous-service shape of O10). Returns the
    listener so callers can ``spark.streams.removeListener`` it."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Bridge(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802 (Spark API names)
            pass

        def onQueryProgress(self, event):  # noqa: N802
            p = event.progress
            callback(
                {
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "processed_rows_per_sec": p.processedRowsPerSecond,
                    "sink": str(p.sink),
                }
            )

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    listener = _Bridge()
    spark.streams.addListener(listener)
    return listener
