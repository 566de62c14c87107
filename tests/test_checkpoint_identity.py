"""Checkpoint stage identity: config scoping + backend selection.

Covers the round-2 fixes: a resumed run with a different MatchConfig must
not serve stage tables computed under the old config, and the Iceberg
backend is selected only when an Iceberg catalog is configured (this
sandbox has none, so parquet is exercised and the iceberg request must
fail loudly instead of silently writing parquet).
"""

import pytest
from pyspark.sql import functions as F

from name_matching_spark.checkpoint import (
    StageCheckpoint,
    fingerprint_of,
    iceberg_catalogs,
)
from name_matching_spark.pipeline import MatchConfig, match_names


def test_scoped_changes_identity(spark, tmp_path):
    ck = StageCheckpoint(spark, tmp_path, input_fingerprint="inputs-v1")
    df = spark.range(3).withColumn("x", F.col("id") * 2)
    ck.write("stage1", df)
    assert ck.exists("stage1")
    scoped = ck.scoped("cfg-a")
    assert not scoped.exists("stage1")  # narrower identity, same root
    scoped.write("stage1", df)
    assert scoped.exists("stage1")
    assert not ck.scoped("cfg-b").exists("stage1")
    assert ck.scoped("cfg-a").exists("stage1")


def test_config_fingerprint_distinguishes_configs():
    a = fingerprint_of(MatchConfig())
    b = fingerprint_of(MatchConfig(top_n=10))
    c = fingerprint_of(MatchConfig())
    assert a == c and a != b


def test_resume_after_config_change_recomputes(spark, tmp_path):
    """Same checkpoint root, changed config: results must reflect the NEW
    config (round-1 behavior served the stale tables)."""
    df_m = spark.createDataFrame(
        [(0, "acme corp"), (1, "zenith ltd")], "id long, name string")
    df_q = spark.createDataFrame([(10, "acme corpx")], "id long, name string")
    ck = StageCheckpoint(spark, tmp_path, input_fingerprint="fixed")
    r1 = match_names(spark, df_q, df_m, "id", "name", "id", "name",
                     config=MatchConfig(threshold=0.0), checkpoint=ck)
    assert r1.count() == 1
    # threshold config change must invalidate the cached 'matches' stage
    r2 = match_names(spark, df_q, df_m, "id", "name", "id", "name",
                     config=MatchConfig(threshold=99.9), checkpoint=ck)
    assert r2.count() == 0


def test_backend_selection(spark, tmp_path):
    assert iceberg_catalogs(spark) == []  # no Iceberg jar in this sandbox
    ck = StageCheckpoint(spark, tmp_path)
    assert ck.backend == "parquet"
    with pytest.raises(ValueError, match="Iceberg"):
        StageCheckpoint(spark, tmp_path, backend="iceberg")


def test_cluster_nonconvergence_raises(spark):
    from name_matching_spark.operators.cluster import connected_components

    # a 6-hop chain cannot converge in 2 hash-min rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=2)
    ok = connected_components(edges, max_iterations=10).collect()
    assert {r["component"] for r in ok} == {0}
