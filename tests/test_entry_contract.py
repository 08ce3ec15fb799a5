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


def test_oracle_backed_entries_precede_rows_only():
    """The driver adjudicates queries() in dict order with an observed
    50-entry cap (round 3 lost the last 4 oracle entries to it). Every
    oracle-backed entry must come before every rows-only entry so no
    exact check ever falls outside the window."""
    qkeys = list(entry_mod.queries())
    oracle = set(entry_mod.oracle_sql())
    seen_rows_only = None
    for k in qkeys:
        if k not in oracle:
            seen_rows_only = k
        elif seen_rows_only is not None:
            raise AssertionError(
                f"oracle-backed {k!r} appears after rows-only {seen_rows_only!r}"
            )
    assert len([k for k in qkeys if k in oracle]) <= 50


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


def test_bench_wrapper_extracts_result_line_from_noisy_output():
    """The round-3 driver artifact was lost to daemon teardown tracebacks
    burying the JSON line; the wrapper must recover the result from an
    arbitrarily noisy merged stream — including tracebacks AFTER it —
    and return None (not garbage) when there is none."""
    import json

    from bench import _extract_result_line

    result = json.dumps({"metric": "total_headline_seconds", "value": 1.0})
    noisy = "\n".join(
        [
            "WARN NativeCodeLoader: ...",
            '{"not": "the result"}',
            "[Stage 12:=====>   (9 + 1) / 10]",
            result,
            "Traceback (most recent call last):",
            '  File "pyspark/daemon.py", line 87, in worker',
            "BrokenPipeError: [Errno 32] Broken pipe",
            "{broken json",
        ]
    )
    assert _extract_result_line(noisy) == result
    assert _extract_result_line("no json here\nat all\n") is None
    assert _extract_result_line("") is None
