#!/usr/bin/env python
"""Generate decision-level expected tables from the NumPy oracle.

The driver's correctness gate runs each entry query against a DuckDB
oracle_sql.  For the two end-to-end queries whose scoring kernels are not
SQL-expressible (match_parts_e2e, cluster_pages_e2e), the oracle is the
dependency-free nm_core oracle (the same one validated against the
reference's golden values) materialized to parquet; the oracle_sql is then
a plain read of that table.  Regenerate after any semantic change:

    python tools/gen_expected.py

Inputs are the driver-generated testdata (sf0.01 for match_parts, matching
the driver's correctness scale) and the deterministic pages corpus.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from name_matching_spark.functions.extract import extract_name_bytes  # noqa: E402
from name_matching_spark.nm_core.oracle import (  # noqa: E402
    connected_components_local,
    run_nm_oracle_pairs,
    run_nm_oracle_pairs_variant,
)
from name_matching_spark.sources.pages import pages_rows  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "expected")


def gen_match_parts(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Expected output of entry query match_parts_e2e at the driver's
    correctness scale (part names vs truncated part names, threshold 50,
    top_n 10)."""
    con = duckdb.connect()
    masters = con.execute(
        f"SELECT p_partkey, p_name "
        f"FROM read_parquet('{sf_dir}/part.parquet') ORDER BY p_partkey"
    ).fetchall()
    queries = [(k, n[: len(n) - 2]) for k, n in masters
               if k % 17 == 0 and len(n) > 6]
    # prefix candidate generation mirrors the entry query's MatchConfig
    # (prefix_size=6, df_cap_frac default): the oracle verifies the SCALE
    # path end to end, not just the exact blocker
    rows = run_nm_oracle_pairs(
        [n for _, n in queries], [n for _, n in masters],
        threshold=50.0, top_n=10, prefix_size=6, df_cap_frac=0.25)
    tbl = pa.table({
        "a_id": pa.array([queries[i][0] for i, _, _, _ in rows], pa.int64()),
        "b_id": pa.array([masters[j][0] for _, j, _, _ in rows], pa.int64()),
        "score": pa.array([round(s, 6) for _, _, s, _ in rows],
                          pa.float64()),
        "source": pa.array([src for _, _, _, src in rows], pa.string()),
    })
    path = os.path.join(OUT_DIR, "match_parts_sf001.parquet")
    pq.write_table(tbl, path)
    print(f"{path}: {tbl.num_rows} rows")
    return path


def _parts_corpus(sf_dir: str):
    con = duckdb.connect()
    masters = con.execute(
        f"SELECT p_partkey, p_name "
        f"FROM read_parquet('{sf_dir}/part.parquet') ORDER BY p_partkey"
    ).fetchall()
    queries = [(k, n[: len(n) - 2]) for k, n in masters
               if k % 17 == 0 and len(n) > 6]
    return masters, queries


def gen_match_parts_permetric(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Expected output of entry query match_parts_permetric_e2e: the O18
    per-metric ranking variant (number_of_matches == metric count == 5 for
    the default ensemble) end to end -- one output slot per metric
    column."""
    masters, queries = _parts_corpus(sf_dir)
    rows = run_nm_oracle_pairs_variant(
        [n for _, n in queries], [n for _, n in masters],
        number_of_matches=5, threshold=50.0, top_n=10, prefix_size=6,
        df_cap_frac=0.25)
    tbl = pa.table({
        "a_id": pa.array([queries[i][0] for i, *_ in rows], pa.int64()),
        "b_id": pa.array([masters[j][0] for _, j, *_ in rows], pa.int64()),
        "position": pa.array([p for _, _, _, p, _ in rows], pa.int32()),
        "score": pa.array([round(s, 6) for _, _, s, _, _ in rows],
                          pa.float64()),
        "source": pa.array([src for *_, src in rows], pa.string()),
    })
    path = os.path.join(OUT_DIR, "match_parts_permetric_sf001.parquet")
    pq.write_table(tbl, path)
    print(f"{path}: {tbl.num_rows} rows")
    return path


def gen_match_parts_split(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Expected output of entry query match_parts_split_e2e: the
    preprocess_split dispatch (second candidate search on common-word-
    reduced query names, candidate sets merged) end to end."""
    masters, queries = _parts_corpus(sf_dir)
    rows = run_nm_oracle_pairs(
        [n for _, n in queries], [n for _, n in masters],
        threshold=50.0, top_n=10, prefix_size=6, df_cap_frac=0.25,
        preprocess_split=True)
    tbl = pa.table({
        "a_id": pa.array([queries[i][0] for i, _, _, _ in rows], pa.int64()),
        "b_id": pa.array([masters[j][0] for _, j, _, _ in rows], pa.int64()),
        "score": pa.array([round(s, 6) for _, _, s, _ in rows],
                          pa.float64()),
        "source": pa.array([src for _, _, _, src in rows], pa.string()),
    })
    path = os.path.join(OUT_DIR, "match_parts_split_sf001.parquet")
    pq.write_table(tbl, path)
    print(f"{path}: {tbl.num_rows} rows")
    return path


def gen_cluster_pages(entities: int = 40, variants: int = 2) -> str:
    """Expected output of entry query cluster_pages_e2e: extract -> link
    (threshold 50) -> transitive components over the match edges."""
    pages = pages_rows(entities, variants)
    a = [(r["url"], extract_name_bytes(r["html"], r["text"]))
         for r in pages if r["variant_id"] == 1]
    b = [(r["url"], extract_name_bytes(r["html"], r["text"]))
         for r in pages if r["variant_id"] == 0]
    rows = run_nm_oracle_pairs([n for _, n in a], [n for _, n in b],
                               threshold=50.0, top_n=50)
    edges = [(a[i][0], b[j][0]) for i, j, _, _ in rows]
    labels = connected_components_local(edges)
    ids = sorted(labels)
    tbl = pa.table({
        "id": pa.array(ids, pa.string()),
        "component": pa.array([labels[i] for i in ids], pa.string()),
    })
    path = os.path.join(OUT_DIR, "cluster_pages_40.parquet")
    pq.write_table(tbl, path)
    print(f"{path}: {tbl.num_rows} rows")
    return path


def gen_optimiser_predict(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Expected output of entry query optimiser_predict.  Unlike the
    NumPy-oracle tables above, GBT internals have no dependency-free
    twin, so this table is a REGRESSION pin: generated once by the entry
    query itself (seed-pinned, 1-partition fit -> run/session
    deterministic) and then held fixed, making any behavioral drift in
    the scaler/GBT/predict path a hash mismatch at the gate."""
    import __spark_entry__ as entry
    from name_matching_spark.session import get_spark

    spark = get_spark("gen-expected-optimiser")
    df = entry.queries()["optimiser_predict"](spark, sf_dir).toPandas()
    df = df.sort_values(["qid", "mid"]).reset_index(drop=True)
    path = os.path.join(OUT_DIR, "optimiser_predict_sf001.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    print(f"{path}: {len(df)} rows")
    spark.stop()
    return path


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    gen_match_parts()
    gen_match_parts_permetric()
    gen_match_parts_split()
    gen_cluster_pages()
    gen_optimiser_predict()
