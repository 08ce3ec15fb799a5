"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. The flagship metric is extraction throughput
(docs/sec) over a deterministic pages corpus derived JVM-side from the
``documents`` table and volume-replicated (no Python in datagen, no
external data).

Scaling evidence (north rule ≥0.8 efficiency between N and 4N): run
``python scaling_bench.py`` — it launches this extraction job in fresh
JVMs at local[8] and local[32] and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "8"))
# 3 runs: run1 pays codegen/JIT; run2 can still absorb the tail of run1's
# ASYNC C2 compilation (measured: a warm 0.8 s simhash run charged 50
# CPU-s of background JIT); run3 is reliably steady-state. CPU figure =
# min over warm runs (best_of), wall = min over all runs.
REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

# Every name timed and emitted in the stdout `queries` map. [0] is the
# flagship extraction pipeline (timed on the replicated corpus, not via
# queries()). The stdout-line length budget is unit-tested against this
# exact list — adding a name here keeps the test honest.
HEADLINE_QUERIES = [
    "extract_pipeline",
    "agg_lineitem_q1",
    "tpch_q3",
    "window_latest_event",
    "map_merge_agg",
    "events_hourly",
    "dedup_exact",
    "jaccard_pairs",
    "minhash_lsh",
    "simhash",
    "simhash_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_presigned_topk",
    "ivf_topk",
    "ivf_presigned_topk",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "char_chunks",
    "token_window_chunks",
    "token_count",
    "lang_id",
    "quality",
    "fingerprint",
    "uri_parts",
    "multimodal_meta",
    "chunker_token_windows",
    "chunker_hierarchical",
    "curate_stamp",
    "training_shards_roundtrip",
    "url_filter",
    "url_filter_domains",
    "repetition_signals",
    "segment_dup",
    "decontaminate",
    "pii_redact",
    "gopher_filter",
    "minhash_clusters",
    "pack_sequences",
    "mixture_split",
    "semantic_dedup",
    "lm_perplexity",
    "c4_clean",
    "dsir_select",
    "web_canonical_cap",
    "substring_dedup",
    "snapshot_delta",
    "bloom_seen",
    "pagerank",
    "quality_filter",
    "decontaminate_fuzzy",
    "warc_roundtrip",
    "minhash_index_dedup",
    "curation_funnel",
    "domain_quality",
]

# Timed every run like the headline, but reported ONLY in
# bench_full.json — the stdout result line is at its length budget
# (driver tail capture is 2000 chars; unit-tested < 1800 worst-case)
# and these newer entries don't displace the historical wall map.
EXTRA_TIMED_QUERIES = [
    # moved from the headline when the stdout line hit its 1800-char
    # budget (both have cheaper twins still on the line: ivf_topk /
    # embedding_near_dup_lsh) — full history continues in bench_full.json
    "ivf_kmeans_topk",
    "embedding_near_dup_lsh_multi",
    "bm25_topk",
    "embedding_whiten",
    "profile_table",
    "hll_distinct",
    "ngram_topk",
    "compact_roundtrip",
    "zorder_layout",
    "cms_counts",
    "quantile_sketch",
    "asof_join",
    "range_join",
    "pq_topk",
    "ivf_pq_topk",
    "hll_grouped",
    "stats_pruned_scan",
    "normalize_text",
    "incremental_ingest",
    "ingest_state_report",
    "ivf_index_maintenance",
    "bloom_pruned_scan",
    "content_locate",
    "corpus_time_travel",
    "takedown_delete",
    "ingest_drift",
    "batch_rollback",
    "upsert_latest",
    "pdf_extract",
]


def _sf_of(path: str) -> float:
    try:
        return float(path.rstrip("/").split("sf")[-1])
    except ValueError:
        return -1.0


def replicated_pages(spark: SparkSession, sf_dir: str, factor: int) -> DataFrame:
    """documents → pages, replicated `factor`× with distinct urls (pure
    relational explode; deterministic)."""
    from docling_jobkit_spark.sources.readers import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    return pages.select(
        F.posexplode(F.sequence(F.lit(1), F.lit(factor))).alias("rep", "_x"),
        "*",
    ).select(
        F.concat_ws("#", "url", F.col("rep").cast("string")).alias("url"),
        "warc_ts",
        "html",
        "text",
        "lang",
    )


def _noop_write(df: DataFrame) -> int:
    df.write.format("noop").mode("overwrite").save()
    return -1


def _tree_cpu_stats() -> dict[int, float]:
    """Per-pid CPU-seconds (utime+stime+reaped-children) of THIS process
    tree — the bench driver, the Spark JVM, and every pyspark worker.
    Wall-clock on this host drifts up to 3x on ~10-minute windows
    (BENCH.md), so the per-query CPU delta is the noise-immune signal
    for cross-round comparison: host contention stretches wall time but
    barely moves the CPU a fixed plan burns.

    Returned per-pid so _cpu_delta can document and bound its failure
    modes explicitly (see its docstring for the sum-vs-pairwise
    analysis)."""
    hz = os.sysconf("SC_CLK_TCK")
    # build ppid map once per call (bench cadence: a few calls/second max)
    ppid_of: dict[int, int] = {}
    stats: dict[int, float] = {}
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit():
            continue
        try:
            with open(f"/proc/{pid_s}/stat") as f:
                rest = f.read().rsplit(")", 1)[1].split()
        except (OSError, IndexError):
            continue
        pid = int(pid_s)
        ppid_of[pid] = int(rest[1])
        # utime+stime+cutime+cstime: reaped python workers' CPU is
        # credited to the daemon's children counters, so worker churn
        # between stages doesn't lose time
        stats[pid] = sum(int(rest[i]) for i in (11, 12, 13, 14)) / hz
    mine = {os.getpid()}
    grew = True
    while grew:
        grew = False
        for pid, ppid in ppid_of.items():
            if ppid in mine and pid not in mine:
                mine.add(pid)
                grew = True
    return {p: stats[p] for p in mine}


def _system_busy_seconds() -> float:
    """Whole-host busy CPU-seconds since boot (/proc/stat aggregate,
    everything except idle+iowait) — paired with the process-tree total
    to expose EXTERNAL load during a bench window."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    return (sum(vals) - idle) / os.sysconf("SC_CLK_TCK")


def _cpu_delta(before: dict[int, float], after: dict[int, float]) -> float:
    """Whole-tree delta, floored at zero. The plain sum difference is
    EXACT whenever deaths are reaped inside the tree: a worker's direct
    counters vanish but reappear in its parent's children-counters, so
    the totals cancel. (A pairwise per-pid variant was tried and
    rejected: dropping a dead pid's before-entry while its parent's
    cutime jumps by the worker's full lifetime re-credits pre-window CPU
    — systematic overcount.) The one loss mode is a worker orphaned to
    init mid-window, whose accumulated CPU leaves the tree entirely and
    can pull the raw difference negative — clamp to 0 (undercount one
    sample) rather than report negative CPU."""
    return max(0.0, sum(after.values()) - sum(before.values()))


def _cpu_needs_more_runs(samples: list[float], n: int, max_runs: int) -> bool:
    """Whether best_of should spend another run. Beyond the base ``n``
    runs, up to ``max_runs`` total are spent when (a) no positive WARM
    sample exists yet (run 0 is cold; a clamped-to-zero warm sample must
    not silently fall back to the cold value), or (b) every warm sample
    is JIT-contaminated: async C2 compilation from an earlier run can
    bleed into a warm window (measured: a 0.8 s warm simhash run charged
    50 CPU-s; the 50.78 landed in the round-4 snapshot). A warm sample
    >2x a faster earlier sample is physically backwards for a fixed plan
    — treat it as contaminated and retry. Pure; unit-tested."""
    if len(samples) >= max_runs:
        return False
    if len(samples) < n:
        return True
    warm = [s for s in samples[1:] if s > 0]
    if not warm:
        return True
    best_any = min(s for s in samples if s > 0)
    return min(warm) > 2.0 * best_any


def _steady_cpu(samples: list[float]) -> float:
    """Steady-state CPU figure from per-run samples (index 0 = cold run,
    which pays 5-40 CPU-s of Janino codegen/JIT). Min over positive warm
    samples; if every warm sample is contaminated (>2x a faster earlier
    sample — see _cpu_needs_more_runs) fall back to the best positive
    sample overall rather than record the contaminated value. Pure;
    unit-tested."""
    positive = [s for s in samples if s > 0]
    if not positive:
        return 0.0
    warm = [s for s in samples[1:] if s > 0]
    if not warm:
        return min(positive)
    m = min(warm)
    best_any = min(positive)
    return best_any if m > 2.0 * best_any else m


def main() -> None:
    from docling_jobkit_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS, tuned=True)
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    _bench_wall0 = time.perf_counter()
    _sys_busy0 = _system_busy_seconds()
    _tree0 = sum(_tree_cpu_stats().values())

    # --- flagship: extraction throughput on the replicated corpus -------
    pages = replicated_pages(spark, SF_DIR, REPLICATE).cache()
    n_docs = pages.count()
    total_bytes = pages.agg(F.sum(F.length("html"))).collect()[0][0]

    from docling_jobkit_spark.plans.pipeline import ExtractionPipeline, PipelineConfig

    cpu_timings: dict[str, float] = {}

    def best_of(n: int, fn) -> tuple[float, float]:
        """(min wall, steady-state CPU) over n runs — min-wall is standard
        benching practice on a host whose capacity drifts up to 3x
        (BENCH.md). The CPU-seconds figure is the noise-immune twin (see
        _tree_cpu_stats + _cpu_delta) and must measure the STEADY-STATE
        plan, so it prefers warm samples: the first run pays 5-40 CPU-s of
        Janino codegen/JIT on the interpreted higher-order-function family
        (measured: simhash_pairs 37 cold vs 14 warm), and a clamped-to-
        zero warm sample (window lost accounting to an orphaned worker)
        must not silently fall back to the cold value — the round-3
        artifact reported 62 CPU-s for simhash_pairs that way. Up to 2
        extra runs are spent to obtain at least one positive warm
        sample."""
        best = float("inf")
        cpu_samples: list[float] = []
        # n == 1 is the explicit smoke mode: one run, cold sample, no
        # warm-seeking retries
        max_runs = n + 2 if n > 1 else 1
        while _cpu_needs_more_runs(cpu_samples, n, max_runs):
            c0 = _tree_cpu_stats()
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
            cpu_samples.append(_cpu_delta(c0, _tree_cpu_stats()))
        return best, _steady_cpu(cpu_samples)

    pipe = ExtractionPipeline(
        spark, PipelineConfig(num_partitions=CPUS * 2, use_slicing=False)
    )
    dt, cpu = best_of(REPEATS, lambda: _noop_write(pipe.extract(pages)))
    timings["extract_pipeline"] = round(dt, 3)
    cpu_timings["extract_pipeline"] = round(cpu, 2)
    extras["extract_docs_per_sec"] = round(n_docs / dt, 1)
    extras["extract_mb_per_sec"] = round(total_bytes / dt / 1e6, 1)
    extras["extract_n_docs"] = n_docs

    # slice fan-out variant: multi-page docs split per-slice, slices
    # repartitioned across cores, reassembled byte-exactly (F1/F2)
    pipe_sliced = ExtractionPipeline(
        spark, PipelineConfig(num_partitions=CPUS * 2, use_slicing=True)
    )
    extras["extract_sliced_secs"] = round(
        best_of(REPEATS, lambda: _noop_write(pipe_sliced.extract(pages)))[0], 3
    )
    pages.unpersist()

    # --- headline operator queries -------------------------------------
    for name in HEADLINE_QUERIES[1:]:  # [0] = extract_pipeline, timed above
        q = queries[name]
        dt, cpu = best_of(REPEATS, lambda: _noop_write(q(spark, SF_DIR)))
        timings[name] = round(dt, 3)
        cpu_timings[name] = round(cpu, 2)

    # file-only timings (stdout line is at its length budget)
    extra_timings: dict[str, float] = {}
    for name in EXTRA_TIMED_QUERIES:
        q = queries[name]
        dt, cpu = best_of(REPEATS, lambda: _noop_write(q(spark, SF_DIR)))
        extra_timings[name] = round(dt, 3)
        cpu_timings[name] = round(cpu, 2)

    # external-load audit: CPU burned by processes OUTSIDE this bench's
    # tree during the window. A same-day run with pytest executing
    # concurrently recorded minhash_lsh at 160 CPU-s (real warm cost
    # 34-38) — this field makes that failure mode visible in the
    # artifact instead of masquerading as a regression.
    _wall_span = max(time.perf_counter() - _bench_wall0, 1e-9)
    _ext_cpu = max(
        (_system_busy_seconds() - _sys_busy0)
        - (sum(_tree_cpu_stats().values()) - _tree0),
        0.0,
    )
    extras["host_ext_cores"] = round(_ext_cpu / _wall_span, 2)

    result_line, full_payload = build_result(
        timings, cpu_timings, extras, _recorded_scaling(),
        extra_timings=extra_timings,
    )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json"),
        "w",
    ) as f:
        json.dump(full_payload, f, indent=1)
    # Stop the session BEFORE emitting the result: teardown of the
    # enlarged idle python-worker pool sprays BrokenPipeError tracebacks
    # (cost the driver the entire round-3 bench, BENCH_r03 parsed:null).
    # In child mode (the default path — see main entry below) the JVM and
    # daemons inherit the child's piped fds, so even stragglers that
    # outlive stop() land in the parent's filter, never on the real
    # stdout.
    spark.stop()
    print(result_line)
    sys.stdout.flush()


def build_result(
    timings: dict[str, float],
    cpu_timings: dict[str, float],
    extras: dict,
    scaling: dict,
    extra_timings: dict[str, float] | None = None,
) -> tuple[str, dict]:
    """(stdout line, full payload). The stdout line must fit the driver's
    2000-char stdout-tail capture WITH headroom — BENCH_r04 was lost to a
    ~2.8 KB line whose front truncated mid-stream (the round-3 loss was
    tracebacks; both fixed). Budget: the full wall-clock ``queries`` map
    stays on stdout (the driver contract), compact separators, 2-decimal
    rounding; the CPU map and anything else bulky goes ONLY to
    bench_full.json / BENCH.md. Length is unit-tested < 1800 chars
    against the real 40-query headline list (tests/test_entry_contract)."""
    total = round(sum(timings.values()), 3)
    base = {
        "metric": "total_headline_seconds",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "timing": f"min_of_{REPEATS}",
        "sf": _sf_of(SF_DIR),
        "cpus": CPUS,
        **extras,
        **scaling,
        "cpu_map": "bench_full.json",
    }
    line = json.dumps(base, separators=(",", ":"))
    full = {
        **base,
        "queries_cpu_seconds": cpu_timings,
        "queries_file_only": extra_timings or {},
    }
    return line, full


def _recorded_scaling(bench_md_text: str | None = None) -> dict:
    """Surface the scaling_bench.py evidence (BENCH.md) — the north-rule
    N-vs-4N criterion — as LABELED fields: the best clean-window PASS on
    record AND the most recent campaign, separately. Reporting only the
    last campaign (the round-4 defect) would hand a parsed consumer a
    host-collapse number (0.352, worst degraded window of the day) as if
    it were the pipeline verdict, while the attributed evidence is PASS
    on clean windows (0.954/0.851/0.822/0.81, rounds 2-3)."""
    import re

    try:
        if bench_md_text is None:
            bench_md_text = open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md")
            ).read()
    except OSError:
        return {}
    # Every campaign summary line: "scaling efficiency: **X** (gate ≥ 0.8: PASS/FAIL"
    runs = re.findall(
        r"scaling efficiency: \*\*([0-9.]+)\*\* \(gate ≥ 0.8: (PASS|FAIL)",
        bench_md_text,
    )
    if not runs:
        return {}
    clean_counts = re.findall(r"gate median over (\d+) clean rounds", bench_md_text)
    levels = re.findall(r"levels=(\d+)/(\d+)", bench_md_text)
    passes = [float(v) for v, verdict in runs if verdict == "PASS"]
    out: dict = {
        "scaling_eff_last_campaign": float(runs[-1][0]),
        "scaling_gate": ">=0.8",
    }
    if passes:
        out["scaling_eff_best_clean"] = max(passes)
        # the most recent campaign that PASSED the clean-round gate: a
        # trailing degraded-host FAIL (an overnight retry campaign with
        # zero clean windows) must not hide a same-day clean PASS
        out["scaling_eff_last_pass"] = passes[-1]
    if clean_counts:
        out["scaling_clean_rounds_last"] = int(clean_counts[-1])
    if levels:
        out["scaling_levels"] = f"{levels[-1][0]}v{levels[-1][1]}"
    # Which methodology the last campaign used: sections written before
    # the mode knob existed carry no "mode=" marker and were all
    # single-JVM local[N]. local-cluster (one vs four executor JVMs) is
    # the gate methodology since the 2026-08-18 A/B showed local[16]'s
    # per-doc CPU tax is intrinsic to threads-in-one-JVM, not pipeline.
    modes = re.findall(r"## Scaling run \((?:mode=(\w+), )?", bench_md_text)
    if modes:
        out["scaling_mode"] = modes[-1] or "jvm"
    return out


def _extract_result_line(text: str) -> str | None:
    """Last line of ``text`` that parses as the bench result JSON (has a
    "metric" key) — everything else (Spark logs, progress bars, daemon
    teardown tracebacks interleaved on the merged stream) is discarded.
    Unit-tested: tests/test_entry_contract.py."""
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                if json.loads(line).get("metric"):
                    return line
            except json.JSONDecodeError:
                continue
    return None


def _run_as_filtering_wrapper() -> int:
    """Re-exec the bench in a child process with BOTH streams captured,
    then print exactly one line — the result JSON — on the real stdout.

    Why: the Spark JVM and the pyspark daemon fork-tree inherit the bench
    process's stdout/stderr fds at launch. Redirecting our own fds after
    the fact cannot silence them, and their async teardown tracebacks
    (BrokenPipeError storms from the enlarged idle-worker pool) buried
    the round-3 JSON line (BENCH_r03.json: parsed null). Running the real
    bench as a child gives every descendant piped fds; the parent waits
    for full reaping, extracts the JSON line, and emits it alone."""
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD="1")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    result_line = _extract_result_line(proc.stdout)
    if result_line is None:
        sys.stderr.write(proc.stdout[-4000:])
        sys.stderr.write("\nbench child produced no result JSON line\n")
        return proc.returncode or 1
    print(result_line)
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD"):
        sys.exit(main())
    sys.exit(_run_as_filtering_wrapper())
