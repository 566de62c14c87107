"""Driver-contract hygiene: queries()/oracle_sql() registries stay in sync.

No Spark session needed -- this guards against a new query landing
without an oracle (or an oracle for a renamed/removed query) before the
driver's correctness gate would notice.
"""

import importlib
import sys


def _entry():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_every_oracle_has_a_query():
    e = _entry()
    q, o = set(e.queries()), set(e.oracle_sql())
    assert o <= q, f"oracles without queries: {sorted(o - q)}"


def test_every_query_is_value_oracled():
    e = _entry()
    rows_only = set(e.queries()) - set(e.oracle_sql())
    # every query has a DuckDB value oracle (ann_lsh_topk joined in round 3:
    # its hyperplanes are md5-deterministic, embedded as SQL literals)
    assert rows_only == set(), sorted(rows_only)


def test_oracle_sql_is_nonempty_strings():
    e = _entry()
    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
