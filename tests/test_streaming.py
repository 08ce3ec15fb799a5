"""Structured-Streaming variant: queue semantics (arrival → extraction →
exactly-once committed output; Trigger.AvailableNow drain). The analog of
the reference's durable-queue orchestrators (SURVEY §2.7 O1/O5/O8)."""

from __future__ import annotations

import os

from docling_jobkit_spark.corpus import write_pages_parquet
from docling_jobkit_spark.streaming import start_file_stream, stream_extract


def test_stream_drain_and_incremental_exactly_once(spark, tmp_path):
    indir = str(tmp_path / "in")
    os.makedirs(indir)
    write_pages_parquet(f"{indir}/batch1.parquet", 60, seed=3)

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q = start_file_stream(
        stream_extract(spark, indir), out_dir, ckpt, available_now=True
    )
    q.awaitTermination(180)
    assert spark.read.parquet(out_dir).count() == 60

    # a new file arrives; a restarted AvailableNow query must process ONLY
    # the new file (checkpoint = the durable queue cursor)
    write_pages_parquet(f"{indir}/batch2.parquet", 25, seed=4)
    q2 = start_file_stream(
        stream_extract(spark, indir), out_dir, ckpt, available_now=True
    )
    q2.awaitTermination(180)
    out = spark.read.parquet(out_dir)
    assert out.count() == 85  # 60 + 25, no reprocessing
    assert out.select("url").distinct().count() >= 80
