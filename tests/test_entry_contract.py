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


def test_rows_only_set_is_exactly_ann_lsh():
    e = _entry()
    rows_only = set(e.queries()) - set(e.oracle_sql())
    # seeded random hyperplanes are not SQL-reproducible; everything else
    # must be value-oracled
    assert rows_only == {"ann_lsh_topk"}, sorted(rows_only)


def test_oracle_sql_is_nonempty_strings():
    e = _entry()
    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
