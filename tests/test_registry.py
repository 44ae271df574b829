"""Registry-contract structure tests: the driver's entry points stay sane."""

from __future__ import annotations

import importlib.util
import os


def _load_entry():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_structure():
    mod = _load_entry()
    qs, osql = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 80
    assert set(osql) <= set(qs)  # every oracle has a query
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
    # rows-only set is intentional and small
    rows_only = set(qs) - set(osql)
    # s9_table_metadata reports file-level storage facts (size/mtime) that
    # SQL over the data cannot see — rows-only by design.
    # pipeline_ingest_e2e gained a full-chain DuckDB oracle in round 4.
    assert rows_only == {"s9_table_metadata"}


def test_oracle_sql_references_known_tables():
    mod = _load_entry()
    tables = ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings")
    for name, sql in mod.oracle_sql().items():
        assert any(t in sql for t in tables), f"{name} references no known table"
