"""Local Spark-vs-DuckDB parity for oracles the driver gate can't watch
between rounds.

The driver compares every queries()/oracle_sql() pair at sf0.01 once per
round; this test keeps the newest generated-SQL oracle (ann_lsh_topk --
md5-deterministic hyperplanes embedded as SQL literals) honest at sf0.001
on every pytest run, so a drift in either side fails fast locally.
"""

import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def _entry():
    import importlib
    return importlib.import_module("__spark_entry__")


def test_ann_lsh_topk_matches_duckdb_oracle(spark):
    e = _entry()
    sdf = e.queries()["ann_lsh_topk"](spark, SF_DIR).toPandas()
    got = sorted(map(tuple, sdf[["qid", "vec_id", "rank"]].values.tolist()))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')")
    odf = con.execute(e.oracle_sql()["ann_lsh_topk"]).fetch_df()
    want = sorted(map(tuple, odf[["qid", "vec_id", "rank"]].values.tolist()))

    assert len(got) > 0
    assert got == want
