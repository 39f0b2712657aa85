"""Structural checks of the driver contract (no Spark needed)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# Queries intentionally without a DuckDB twin; the driver records a
# rows-only check for these. Since r4 the pure-SQL XXH64 machine
# (oracle_xxh.py) gave the xxhash64 paths (pipeline_full,
# dedup_*_fast) value-exact twins, leaving only the binary-payload
# operator (no DuckDB analog; pixel/sample values pytest-asserted).
ROWS_ONLY = {"media_features"}


def test_every_query_has_oracle_or_is_declared_rows_only():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert oracles <= qs, oracles - qs
    assert qs - oracles == ROWS_ONLY


def test_oracle_sql_strings_are_nonempty():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and len(sql) > 20, name


def test_queries_are_callables():
    for name, fn in entry.queries().items():
        assert callable(fn), name
