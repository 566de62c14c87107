"""Per-stage checkpoint tables with lineage + metrics (resumable pipeline).

Replaces the reference's pickle intermediate cache
(name_matcher.py:620-637,697-737) with partitioned parquet stage tables
(Iceberg-shaped: snapshot directory + _SUCCESS atomicity + a lineage/metrics
sidecar table).  A killed job resumes from the last complete stage: the
probe is simply "does a committed stage table exist for this fingerprint".

Layout under ``root``:
    <root>/<stage>/data/            stage output (parquet, _SUCCESS-gated)
    <root>/<stage>/metrics/         one-row lineage table per write:
        stage, input_fingerprint, rows_out, wall_ms, written_at_ms
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class StageCheckpoint:
    def __init__(self, spark: SparkSession, root: str | Path,
                 input_fingerprint: str = ""):
        self.spark = spark
        self.root = Path(root)
        self.fingerprint = input_fingerprint

    def _dir(self, stage: str) -> Path:
        return self.root / stage

    def exists(self, stage: str) -> bool:
        d = self._dir(stage)
        meta = d / "meta.json"
        if not (d / "data" / "_SUCCESS").exists() or not meta.exists():
            return False
        try:
            recorded = json.loads(meta.read_text())
        except (ValueError, OSError):
            return False
        return recorded.get("input_fingerprint") == self.fingerprint

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(str(self._dir(stage) / "data"))

    def write(self, stage: str, df: DataFrame,
              partition_by: list[str] | None = None) -> DataFrame:
        d = self._dir(stage)
        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(d / "data"))
        out = self.spark.read.parquet(str(d / "data"))
        rows = out.count()
        wall_ms = int((time.time() - t0) * 1000)
        meta = {
            "stage": stage,
            "input_fingerprint": self.fingerprint,
            "rows_out": rows,
            "wall_ms": wall_ms,
            "written_at_ms": int(time.time() * 1000),
        }
        (d / "meta.json").write_text(json.dumps(meta))
        mrow = self.spark.createDataFrame(
            [(stage, self.fingerprint, rows, wall_ms, meta["written_at_ms"])],
            "stage string, input_fingerprint string, rows_out long, "
            "wall_ms long, written_at_ms long",
        )
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
