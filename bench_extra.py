"""Per-query isolation harness (guide §1.4) — NOT the frozen bench.

Times each named query with the noop sink, separating driver-side
construction (``q(spark, sf_dir)``) from execution (noop write), and can
dump ``explain("formatted")`` to plans/r06/. Usage:

    python bench_extra.py q1 q2 ...          # time (2 runs each)
    python bench_extra.py --explain q1 ...   # also write plans/r06/<q>_<tag>.txt
    python bench_extra.py --profile q1       # cProfile the driver for one query
    SPARK_GRAFT_PLAN_TAG=after python bench_extra.py --explain q1

Numbers from here are cited in OPTIMIZATION_r06.md; the frozen bench.py
stays the driver's measurement."""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")
RUNS = int(os.environ.get("SPARK_GRAFT_EXTRA_RUNS", "2"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_explain = "--explain" in sys.argv
    do_profile = "--profile" in sys.argv

    from docling_jobkit_spark.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS, tuned=True)
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    os.makedirs("plans/r06", exist_ok=True)

    for name in args:
        q = queries[name]
        best_build = best_exec = float("inf")
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            df = q(spark, SF_DIR)
            t1 = time.perf_counter()
            _noop(df)
            t2 = time.perf_counter()
            best_build = min(best_build, t1 - t0)
            best_exec = min(best_exec, t2 - t1)
            print(
                f"{name} run{i}: build {t1 - t0:.2f}s exec {t2 - t1:.2f}s "
                f"total {t2 - t0:.2f}s",
                flush=True,
            )
        print(f"RESULT {name}: build {best_build:.2f}s exec {best_exec:.2f}s "
              f"total {best_build + best_exec:.2f}s", flush=True)
        if do_explain:
            df = q(spark, SF_DIR)
            with open(f"plans/r06/{name}_{TAG}.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
            print(f"wrote plans/r06/{name}_{TAG}.txt", flush=True)
        if do_profile:
            import cProfile
            import pstats

            prof = cProfile.Profile()
            prof.enable()
            df = q(spark, SF_DIR)
            _noop(df)
            prof.disable()
            st = pstats.Stats(prof)
            st.sort_stats("cumulative").print_stats(40)
    spark.stop()


if __name__ == "__main__":
    main()
