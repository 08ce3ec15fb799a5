"""Static driver-contract invariants (no Spark session needed)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_every_oracle_has_a_query():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"


def test_contract_size():
    assert len(entry_mod.queries()) >= 30
    assert len(entry_mod.oracle_sql()) >= 24


def test_oracle_sql_uses_registered_tables_only():
    tables = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    import re

    for name, sql in entry_mod.oracle_sql().items():
        # CTE names, with or without an explicit column list
        # ("closure(a, b) as (" declares CTE "closure")
        ctes = set(re.findall(r"(\w+)\s*(?:\([\w\s,]*\))?\s+as\s*\(", sql, re.I))
        froms = set(re.findall(r"(?:from|join)\s+([a-z_]+)", sql, re.I))
        unknown = froms - tables - ctes
        assert not unknown, f"{name}: unknown tables {unknown}"
