"""spark-submit entry point.

Production deployment shape (north rule): package the library and run

    zip -r djs.zip docling_jobkit_spark
    spark-submit --py-files djs.zip -m docling_jobkit_spark \
        --input s3a://bucket/pages/ --output s3a://bucket/extracted/ \
        --run-id crawl-2026-08

or locally: ``python -m docling_jobkit_spark --input ... --output ...``.

The driver only assembles the plan and iterates commit groups; on a
cluster the SparkSession comes from spark-submit (master/executors are
deployment config), so ``--cores`` is ignored there.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="docling_jobkit_spark")
    ap.add_argument("--input", required=True, help="pages parquet path/table")
    ap.add_argument("--output", required=True, help="output root (results+manifest+metrics)")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--max-bytes", type=int, default=64 * 1024 * 1024)
    def _positive_int(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError(f"must be >= 1, got {n}")
        return n

    ap.add_argument(
        "--num-partitions", type=_positive_int, default=None,
        help="extraction parallelism; default 2 x spark.defaultParallelism "
             "(scales with the deployment instead of a hard constant)",
    )
    ap.add_argument("--commit-groups", type=int, default=16)
    ap.add_argument("--no-slicing", action="store_true")
    ap.add_argument("--no-repartition", action="store_true",
                    help="rely on scan-time file splitting (skew-free inputs)")
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from docling_jobkit_spark.metrics import job_summary
    from docling_jobkit_spark.plans.pipeline import ExtractionPipeline, PipelineConfig

    active = SparkSession.getActiveSession()
    if active is not None:  # under spark-submit the session already exists
        spark = active
    else:
        from docling_jobkit_spark.session import get_spark

        spark = get_spark("docling-jobkit-spark", cores=args.cores, tuned=True)

    if args.num_partitions is not None:
        num_partitions = args.num_partitions
    elif spark.sparkContext.master.startswith("local"):
        num_partitions = spark.sparkContext.defaultParallelism * 2
    else:
        # on a cluster, defaultParallelism is sampled at driver startup
        # and under dynamic allocation reflects only the INITIAL
        # executors — floor it so the extraction stage stays wide while
        # the cluster scales up
        num_partitions = max(256, spark.sparkContext.defaultParallelism * 2)

    cfg = PipelineConfig(
        max_bytes=args.max_bytes,
        num_partitions=num_partitions,
        n_commit_groups=args.commit_groups,
        use_slicing=not args.no_slicing,
        repartition=not args.no_repartition,
    )
    pipe = ExtractionPipeline(spark, cfg)
    pages = pipe.read_pages(args.input)
    try:
        from py4j.protocol import Py4JJavaError

        sink_errors: tuple[type[BaseException], ...] = (OSError, Py4JJavaError)
    except ImportError:  # pragma: no cover
        sink_errors = (OSError,)
    try:
        log = pipe.run(pages, args.output, run_id=args.run_id)
    except sink_errors as exc:
        # sink/target failure: the Spark parquet write surfaces JVM I/O
        # errors as Py4JJavaError, driver-local manifest I/O as OSError.
        # Report the typed taxonomy entry the reference's public errors
        # define — retryable, so an orchestrator re-invokes and resume
        # skips the committed groups.
        from docling_jobkit_spark.extractor.errors import PHASE_SINK, classify_failure

        info = classify_failure(exc, phase=PHASE_SINK)
        print(json.dumps({"run_id": args.run_id, "error": info.as_dict()}))
        return 2
    results = log.committed_results(spark)
    summary = job_summary(results).collect()[0].asDict() if results is not None else {}
    print(json.dumps({"run_id": args.run_id, "output": args.output, **summary}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
