"""Stage-checkpoint write/probe/resume semantics (kill/resume contract)."""

from name_matching_spark.checkpoint import StageCheckpoint


def test_write_read_roundtrip(spark, tmp_path):
    ck = StageCheckpoint(spark, tmp_path, "fp1")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out = ck.write("stage1", df)
    assert out.count() == 2
    assert ck.exists("stage1")
    assert {r["id"] for r in ck.read("stage1").collect()} == {1, 2}


def test_get_or_compute_skips_recompute(spark, tmp_path):
    ck = StageCheckpoint(spark, tmp_path, "fp1")
    calls = []

    def compute():
        calls.append(1)
        return spark.createDataFrame([(1,)], "id long")

    ck.get_or_compute("s", compute)
    ck.get_or_compute("s", compute)
    assert len(calls) == 1  # resumed from the committed table


def test_fingerprint_mismatch_recomputes(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id long")
    StageCheckpoint(spark, tmp_path, "fp1").write("s", df)
    ck2 = StageCheckpoint(spark, tmp_path, "fp2")
    assert not ck2.exists("s")  # input changed -> stale checkpoint ignored


def test_metrics_lineage_rows(spark, tmp_path):
    ck = StageCheckpoint(spark, tmp_path, "fp1")
    ck.write("a", spark.createDataFrame([(1,)], "id long"))
    ck.write("b", spark.createDataFrame([(1,), (2,)], "id long"))
    m = {r["stage"]: r for r in ck.metrics()}
    assert m["a"]["rows_out"] == 1
    assert m["b"]["rows_out"] == 2
    assert all(r["input_fingerprint"] == "fp1" for r in m.values())


def test_incomplete_write_not_resumable(spark, tmp_path):
    ck = StageCheckpoint(spark, tmp_path, "fp1")
    ck.write("s", spark.createDataFrame([(1,)], "id long"))
    # simulate a kill mid-write: _SUCCESS removed
    (tmp_path / "s" / "data" / "_SUCCESS").unlink()
    assert not ck.exists("s")
