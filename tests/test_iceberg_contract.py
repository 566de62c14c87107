"""Iceberg backend contract (mock-level).

No Iceberg jar ships in this sandbox, so the ``writeTo(...).using(
"iceberg")`` branch cannot run against a real catalog here.  This locks
the generated calls down at the mock level instead: table identifiers are
well-formed three-part names, the writer chain is exactly
writeTo -> using("iceberg") [-> partitionedBy(cols)] -> createOrReplace,
the metrics row goes to a sibling ``<stage>_metrics`` table, and the
resume probe checks the same identifier.  Any Iceberg-enabled environment
can then exercise the identical code path for real (the parquet twin of
every behavior is fully tested in test_checkpoint.py / test_resume.py).
"""

from pathlib import Path
from unittest import mock

from name_matching_spark import checkpoint as cp


def _iceberg_ck(tmp_path, spark_mock):
    ck = cp.StageCheckpoint.__new__(cp.StageCheckpoint)
    ck.spark = spark_mock
    ck.root = Path(tmp_path)
    ck.fingerprint = "fp123"
    ck.namespace = "nm_checkpoints"
    ck.backend = "iceberg"
    ck.catalog = "ice"
    return ck


def test_write_data_plain(tmp_path, spark):
    # ``spark`` fixture only provides an active SparkContext for F.col
    sp = mock.MagicMock()
    ck = _iceberg_ck(tmp_path, sp)
    df = mock.MagicMock()

    ck._write_data("candidates", df, partition_by=None)

    df.writeTo.assert_called_once_with("ice.nm_checkpoints.candidates")
    w = df.writeTo.return_value
    w.using.assert_called_once_with("iceberg")
    w.using.return_value.createOrReplace.assert_called_once_with()
    w.using.return_value.partitionedBy.assert_not_called()
    sp.table.assert_called_once_with("ice.nm_checkpoints.candidates")


def test_write_data_partitioned(tmp_path, spark):
    sp = mock.MagicMock()
    ck = _iceberg_ck(tmp_path, sp)
    df = mock.MagicMock()

    ck._write_data("scored", df, partition_by=["__group", "qid"])

    chain = df.writeTo.return_value.using.return_value
    (args, _) = chain.partitionedBy.call_args
    # two Column args, in declared order
    assert len(args) == 2
    assert "__group" in str(args[0]) and "qid" in str(args[1])
    chain.partitionedBy.return_value.createOrReplace \
        .assert_called_once_with()


def test_full_write_emits_metrics_table_and_meta(tmp_path, spark):
    sp = mock.MagicMock()
    sp.table.return_value.count.return_value = 7
    ck = _iceberg_ck(tmp_path, sp)
    df = mock.MagicMock()

    out = ck.write("matches", df)

    assert out is sp.table.return_value
    # lineage meta sidecar still lands on the checkpoint root
    import json
    meta = json.loads((tmp_path / "matches" / "meta.json").read_text())
    assert meta["backend"] == "iceberg"
    assert meta["rows_out"] == 7
    assert meta["input_fingerprint"] == "fp123"
    # metrics row written to the sibling _metrics iceberg table
    mrow = sp.createDataFrame.return_value
    mrow.writeTo.assert_called_once_with("ice.nm_checkpoints.matches_metrics")
    mrow.writeTo.return_value.using.assert_called_once_with("iceberg")
    (mrow.writeTo.return_value.using.return_value.createOrReplace
     .assert_called_once_with())


def test_resume_probe_checks_same_identifier(tmp_path, spark):
    sp = mock.MagicMock()
    sp.table.return_value.count.return_value = 3
    ck = _iceberg_ck(tmp_path, sp)
    ck.write("candidates", mock.MagicMock())

    sp.catalog.tableExists.return_value = True
    assert ck.exists("candidates")
    sp.catalog.tableExists.assert_called_with("ice.nm_checkpoints.candidates")

    # a dropped catalog table invalidates the stage even with meta present
    sp.catalog.tableExists.return_value = False
    assert not ck.exists("candidates")

    # and a different fingerprint invalidates regardless of the catalog
    sp.catalog.tableExists.return_value = True
    ck2 = ck.scoped("other-config")
    assert not ck2.exists("candidates")


def test_read_uses_catalog_table(tmp_path, spark):
    sp = mock.MagicMock()
    ck = _iceberg_ck(tmp_path, sp)
    got = ck.read("scored")
    sp.table.assert_called_once_with("ice.nm_checkpoints.scored")
    assert got is sp.table.return_value
