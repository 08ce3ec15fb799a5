"""Exactly-once commit + cross-run resume (SURVEY §2.7 O5/O6).

The reference guarantees first-terminal-state-wins via Redis WATCH/MULTI
(``orchestrators/ray/redis_helper.py:950-1078``) and reconciles stale
executions via lease+heartbeat (``:1225-1266``). Spark gives task-level
retries for free; what it does NOT give is **cross-run resume**. This
module re-expresses the reference's durable-result discipline with files:

- results land in commit-group directories ``results/group=<gid>/`` —
  written to a staging path first, then atomically ``os.rename``d into
  place (rename is the atomic primitive, exactly the role of Redis MULTI);
- a manifest JSON per group is written tmp-then-rename into ``manifest/``
  — a group is committed iff its manifest file exists (the reference's
  "first terminal status wins": a second writer's rename fails / is
  skipped, and a partially-written group without a manifest is invisible);
- resume = anti-join: pages whose commit group already has a manifest are
  skipped (coarse, partition-pruned), and a ``left_anti`` on url against
  the committed results guards the fine grain (SURVEY §3.3).

The same layout is what the reference's own parquet sink does by hand
(``convert/results_processor.py:372-452``: parquet files + JSON manifest
per upload); with an Iceberg catalog the manifest becomes a snapshot
commit and this module shrinks to a writer config.

Scale note: the manifest holds only group ids + counts (bytes, not rows),
so at 10^12 documents it stays tiny; the fine-grained anti-join is a
broadcast of committed *bucket ranges*, never a collect of urls.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitLog:
    """Filesystem-backed manifest of committed commit-groups."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.results_dir = os.path.join(root, "results")
        self.manifest_dir = os.path.join(root, "manifest")
        self.staging_dir = os.path.join(root, "_staging")
        for d in (self.results_dir, self.manifest_dir, self.staging_dir):
            os.makedirs(d, exist_ok=True)

    # -- commit side --------------------------------------------------

    def committed_groups(self) -> set[int]:
        out = set()
        for name in os.listdir(self.manifest_dir):
            if name.startswith("group-") and name.endswith(".json"):
                out.add(int(name[len("group-"):-len(".json")]))
        return out

    def group_result_path(self, gid: int) -> str:
        return os.path.join(self.results_dir, f"group={gid}")

    def commit_group(self, gid: int, results: DataFrame) -> dict:
        """Write one group's results parquet + manifest, atomically.

        Idempotent: if the manifest already exists the write is skipped
        (first terminal state wins, ``redis_helper.py:1001-1041`` analog).
        """
        manifest_path = os.path.join(self.manifest_dir, f"group-{gid}.json")
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                return json.load(f)

        attempt = uuid.uuid4().hex[:12]
        staging = os.path.join(self.staging_dir, f"group={gid}-{attempt}")
        results.write.mode("overwrite").parquet(staging)

        final = self.group_result_path(gid)
        if os.path.exists(final):  # stale attempt left behind: replace
            shutil.rmtree(final)
        os.rename(staging, final)

        counts = {"gid": gid, "attempt": attempt, "path": final}
        tmp = manifest_path + f".tmp-{attempt}"
        with open(tmp, "w") as f:
            json.dump(counts, f)
        os.rename(tmp, manifest_path)  # the atomic terminalization
        return counts

    # -- resume side ---------------------------------------------------

    def committed_results(self, spark: SparkSession) -> DataFrame | None:
        gids = sorted(self.committed_groups())
        if not gids:
            return None
        paths = [self.group_result_path(g) for g in gids]
        return spark.read.parquet(*paths)

    def remaining_pages(
        self, spark: SparkSession, pages: DataFrame, group_col
    ) -> DataFrame:
        """Pages not yet covered by a committed group.

        Coarse prune on the group id (no shuffle — a broadcast IN-list of
        committed gids), then a ``left_anti`` join on url against committed
        results for exactness across partial groups.
        """
        gids = self.committed_groups()
        if not gids:
            return pages
        remaining = pages.filter(~group_col.isin(sorted(gids)))
        done = self.committed_results(spark)
        if done is None:
            return remaining
        # AQE picks broadcast vs shuffle for the anti-join based on the
        # actual size of the committed-url set at runtime
        return remaining.join(
            done.select("url").distinct(), on="url", how="left_anti"
        )
