"""Per-stage checkpoint tables with lineage + metrics (resumable pipeline).

Replaces the reference's pickle intermediate cache
(name_matcher.py:620-637,697-737) with per-stage tables.  A killed job
resumes from the last complete stage: the probe is "does a committed stage
table exist for this fingerprint".

Two storage backends behind one API:

* **parquet** (default, always available): snapshot directory with
  _SUCCESS atomicity + a meta.json/metrics sidecar -- Iceberg-shaped.
* **iceberg**: when the session has an Iceberg catalog configured
  (``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``),
  stages are written with ``df.writeTo(...).using("iceberg")`` as real
  catalog tables (atomic snapshot commit, schema evolution, time travel),
  matching the north rule's Iceberg-table requirement.  ``backend="auto"``
  picks iceberg when such a catalog exists, parquet otherwise (this
  sandbox ships no Iceberg jar, so tests exercise parquet and assert the
  backend-selection logic).

Stage identity = caller-provided input fingerprint + (for pipeline use) a
hash of the resolved MatchConfig via ``scoped()``: resuming at the same
checkpoint root after a config change must recompute, not serve stale
candidates computed under the old config.

Parquet layout under ``root``:
    <root>/<stage>/data/            stage output (parquet, _SUCCESS-gated)
    <root>/<stage>/meta.json        lineage row (fingerprint, rows, wall)
    <root>/<stage>/metrics/         the same lineage row as a table
"""

from __future__ import annotations

import hashlib
import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def fingerprint_of(obj) -> str:
    """Deterministic short fingerprint of a (nested) config object."""
    return hashlib.sha256(repr(obj).encode()).hexdigest()[:16]


def iceberg_catalogs(spark: SparkSession) -> list[str]:
    """Names of session catalogs backed by an Iceberg implementation."""
    out = []
    for key, value in spark.sparkContext.getConf().getAll():
        parts = key.split(".")
        if (len(parts) == 4 and parts[:3] == ["spark", "sql", "catalog"]
                and "iceberg" in value.lower()):
            out.append(parts[3])
    return sorted(out)


class StageCheckpoint:
    def __init__(self, spark: SparkSession, root: str | Path,
                 input_fingerprint: str = "",
                 backend: str = "auto",
                 namespace: str = "nm_checkpoints"):
        self.spark = spark
        self.root = Path(root)
        self.fingerprint = input_fingerprint
        self.namespace = namespace
        if backend == "auto":
            cats = iceberg_catalogs(spark)
            self.backend = "iceberg" if cats else "parquet"
            self.catalog = cats[0] if cats else None
        elif backend == "iceberg":
            cats = iceberg_catalogs(spark)
            if not cats:
                raise ValueError(
                    "backend='iceberg' requires a configured Iceberg "
                    "catalog (spark.sql.catalog.<name>)")
            self.backend = "iceberg"
            self.catalog = cats[0]
        else:
            self.backend = "parquet"
            self.catalog = None

    def scoped(self, extra: str) -> "StageCheckpoint":
        """New checkpoint whose stage identity also covers ``extra``
        (e.g. a MatchConfig fingerprint): same root, narrower identity."""
        ck = StageCheckpoint.__new__(StageCheckpoint)
        ck.spark = self.spark
        ck.root = self.root
        ck.fingerprint = (f"{self.fingerprint}|{extra}"
                          if self.fingerprint else extra)
        ck.namespace = self.namespace
        ck.backend = self.backend
        ck.catalog = self.catalog
        return ck

    # -- identity ----------------------------------------------------------

    def _dir(self, stage: str) -> Path:
        return self.root / stage

    def _table(self, stage: str) -> str:
        return f"{self.catalog}.{self.namespace}.{stage}"

    def exists(self, stage: str) -> bool:
        d = self._dir(stage)
        meta = d / "meta.json"
        if not meta.exists():
            return False
        try:
            recorded = json.loads(meta.read_text())
        except (ValueError, OSError):
            return False
        if recorded.get("input_fingerprint") != self.fingerprint:
            return False
        if self.backend == "iceberg":
            return self.spark.catalog.tableExists(self._table(stage))
        return (d / "data" / "_SUCCESS").exists()

    # -- IO ----------------------------------------------------------------

    def read(self, stage: str) -> DataFrame:
        if self.backend == "iceberg":
            return self.spark.table(self._table(stage))
        return self.spark.read.parquet(str(self._dir(stage) / "data"))

    def _write_data(self, stage: str, df: DataFrame,
                    partition_by: list[str] | None) -> DataFrame:
        if self.backend == "iceberg":
            from pyspark.sql import functions as F
            w = df.writeTo(self._table(stage)).using("iceberg")
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return self.spark.table(self._table(stage))
        d = self._dir(stage)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(d / "data"))
        return self.spark.read.parquet(str(d / "data"))

    def write(self, stage: str, df: DataFrame,
              partition_by: list[str] | None = None) -> DataFrame:
        d = self._dir(stage)
        t0 = time.time()
        out = self._write_data(stage, df, partition_by)
        rows = out.count()
        wall_ms = int((time.time() - t0) * 1000)
        meta = {
            "stage": stage,
            "backend": self.backend,
            "input_fingerprint": self.fingerprint,
            "rows_out": rows,
            "wall_ms": wall_ms,
            "written_at_ms": int(time.time() * 1000),
        }
        d.mkdir(parents=True, exist_ok=True)
        (d / "meta.json").write_text(json.dumps(meta))
        mrow = self.spark.createDataFrame(
            [(stage, self.fingerprint, rows, wall_ms, meta["written_at_ms"])],
            "stage string, input_fingerprint string, rows_out long, "
            "wall_ms long, written_at_ms long",
        )
        if self.backend == "iceberg":
            mrow.writeTo(self._table(f"{stage}_metrics")) \
                .using("iceberg").createOrReplace()
        else:
            mrow.write.mode("overwrite").parquet(str(d / "metrics"))
        return out

    def get_or_compute(self, stage: str, compute,
                       partition_by: list[str] | None = None) -> DataFrame:
        """Resume probe: read the committed stage table if fingerprint
        matches, else compute, persist, and return the persisted table."""
        if self.exists(stage):
            return self.read(stage)
        return self.write(stage, compute(), partition_by=partition_by)

    def metrics(self) -> list[dict]:
        out = []
        for d in sorted(self.root.glob("*/meta.json")):
            try:
                out.append(json.loads(d.read_text()))
            except (ValueError, OSError):
                pass
        return out
