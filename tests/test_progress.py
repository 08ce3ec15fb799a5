"""Progress-callback bridge (O10 — the reference streams per-chunk
progress to a callback, ``convert/results.py:130-207``; here the driver
polls the scheduler's own counters)."""

from __future__ import annotations

import time

from docling_jobkit_spark.operators.extract_op import extract_documents
from docling_jobkit_spark.progress import ProgressEvent, run_with_progress


def test_run_with_progress_reports_and_returns_result(spark, pages_path):
    events: list[ProgressEvent] = []
    pages = spark.read.parquet(pages_path)

    # slow the job down enough for the poller to observe live stages
    df = extract_documents(pages.repartition(16))
    n = run_with_progress(
        lambda: df.count(),
        events.append,
        spark,
        interval_sec=0.05,
        group_id=f"prog-test-{time.time_ns()}",
    )
    assert n == 400  # the action's result passes through unchanged
    assert events and events[-1].done
    final = events[-1]
    assert final.num_completed_tasks >= 16
    assert final.num_failed_tasks == 0
    # counters are monotonic across observations
    comp = [e.num_completed_tasks for e in events]
    assert comp == sorted(comp)


def test_run_with_progress_propagates_exceptions(spark):
    seen = []

    def boom():
        raise RuntimeError("driver action failed")

    try:
        run_with_progress(boom, seen.append, spark, interval_sec=0.05)
    except RuntimeError as e:
        assert "driver action failed" in str(e)
    else:
        raise AssertionError("exception must propagate unchanged")


def test_streaming_progress_listener(spark, pages_path, tmp_path):
    from docling_jobkit_spark.progress import attach_streaming_progress
    from docling_jobkit_spark.streaming.pipeline import (
        start_file_stream,
        stream_extract,
    )

    seen: list[dict] = []
    listener = attach_streaming_progress(spark, seen.append)
    try:
        results = stream_extract(spark, pages_path.rsplit("/", 1)[0])
        q = start_file_stream(
            results,
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
            available_now=True,
        )
        q.awaitTermination(120)
        deadline = time.time() + 30
        while not seen and time.time() < deadline:
            time.sleep(0.2)  # listener events are delivered asynchronously
    finally:
        spark.streams.removeListener(listener)
    assert seen, "listener saw no micro-batch progress"
    assert sum(p["num_input_rows"] for p in seen) == 400


def test_run_with_progress_without_group_reports_end_counts(spark, pages_path):
    """Without a job group the tracker only sees ACTIVE jobs; the final
    done event must still carry end-state counts (seen-job accumulation)
    and counters must stay monotonic as jobs finish."""
    events: list[ProgressEvent] = []
    pages = spark.read.parquet(pages_path)
    df = extract_documents(pages.repartition(16))
    n = run_with_progress(
        lambda: df.count(), events.append, spark, interval_sec=0.05, group_id=None
    )
    assert n == 400
    final = events[-1]
    assert final.done and final.num_completed_tasks >= 16
    comp = [e.num_completed_tasks for e in events]
    assert comp == sorted(comp)


def test_run_with_progress_default_group_is_exact_for_fast_actions(spark):
    """Default group_id generates a unique job group, so even an action
    that finishes BETWEEN poll samples reports exact end-state counts
    (the old active-jobs sampling reported zeros for sub-interval
    actions)."""
    events: list[ProgressEvent] = []
    n = run_with_progress(
        lambda: spark.range(100).count(),
        events.append,
        spark,
        interval_sec=5.0,  # guarantees zero mid-run samples
    )
    assert n == 100
    final = events[-1]
    assert final.done
    assert final.num_completed_tasks > 0, "fast action must not report zeros"


def test_run_with_progress_restores_caller_job_group(spark):
    """A caller that set its own job group (its cancellation scope) on
    this thread must get it back after run_with_progress — the old
    finally block cleared the group to (None, None), silently losing
    the caller's scope."""
    sc = spark.sparkContext
    sc.setJobGroup("caller-scope", "caller desc", interruptOnCancel=True)
    try:
        n = run_with_progress(
            lambda: spark.range(10).count(), lambda e: None, spark
        )
        assert n == 10
        assert sc.getLocalProperty("spark.jobGroup.id") == "caller-scope"
        assert sc.getLocalProperty("spark.job.description") == "caller desc"
        assert sc.getLocalProperty("spark.job.interruptOnCancel") == "true"
    finally:
        sc.setJobGroup(None, None)
