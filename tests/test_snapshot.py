"""Crawl-snapshot delta (operators/snapshot.py): DuckDB-exact twin over
derived old/new snapshots, worklist semantics, and plan pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.operators.snapshot import (
    snapshot_delta,
    snapshot_delta_summary,
    snapshot_worklist,
)

# old = ids < 400; new = ids >= 100 with text edited for id % 10 == 0:
# removed = 0..99, added = 400..499, common 100..399 (changed iff %10==0)
_TWIN_SQL = """
    with base as (
      select doc_id, text from read_parquet('{path}/documents.parquet')
    ), old as (
      select doc_id,
             sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                 as old_hash
      from base where doc_id < 400
    ), new as (
      select doc_id,
             sha256(trim(regexp_replace(lower(
                 case when doc_id % 10 = 0 then text || ' changed'
                      else text end), '\\s+', ' ', 'g'))) as new_hash
      from base where doc_id >= 100
    )
    select coalesce(o.doc_id, n.doc_id) as doc_id,
           case when o.old_hash is null then 'added'
                when n.new_hash is null then 'removed'
                when o.old_hash = n.new_hash then 'unchanged'
                else 'changed' end as delta_status,
           o.old_hash, n.new_hash
    from old o full outer join new n using (doc_id)
"""


@pytest.fixture(scope="module")
def snaps(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    old = base.where("doc_id < 400")
    new = base.where("doc_id >= 100").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" changed"))
        ).otherwise(F.col("text")),
    )
    return old, new


def _multiset(rows):
    return sorted("|".join(str(v) for v in r) for r in rows)


def test_delta_matches_duckdb_exactly(snaps, sf_dir):
    old, new = snaps
    got = _multiset(tuple(r) for r in snapshot_delta(old, new).collect())
    want = _multiset(duckdb.sql(_TWIN_SQL.format(path=sf_dir)).fetchall())
    assert got == want


def test_delta_partition_counts(snaps):
    old, new = snaps
    counts = {
        r["delta_status"]: r["n_docs"]
        for r in snapshot_delta_summary(old, new).collect()
    }
    assert counts == {
        "removed": 100,
        "added": 100,
        "changed": 30,   # ids 100..390 step 10
        "unchanged": 270,
    }


def test_worklist_is_added_plus_changed_with_payload(snaps):
    old, new = snaps
    wl = snapshot_worklist(old, new).collect()
    assert len(wl) == 130
    assert {r["delta_status"] for r in wl} == {"added", "changed"}
    assert all(r["text"] is not None for r in wl)
    changed = [r for r in wl if r["delta_status"] == "changed"]
    assert all(r["text"].endswith(" changed") for r in changed)


def test_identical_snapshots_are_all_unchanged(snaps):
    old, _ = snaps
    out = snapshot_delta_summary(old, old).collect()
    assert len(out) == 1 and out[0]["delta_status"] == "unchanged"
    assert snapshot_worklist(old, old).count() == 0


def test_plan_shuffles_hashes_not_text(snaps):
    old, new = snaps
    plan = (
        snapshot_delta(old, new)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text" not in ln
