"""Kill/resume: a re-run with the same checkpoint dir must reuse committed
stages and produce identical output."""

import json

from name_matching_spark.checkpoint import StageCheckpoint
from name_matching_spark.pipeline import MatchConfig, match_names
from name_matching_spark.sources.pages import (
    adjusted_names_corpus,
    names_corpus,
)

N = 30


def _run(spark, tmp_path):
    names = names_corpus(N)
    adj = adjusted_names_corpus(N)
    df_b = spark.createDataFrame(
        [(r["id"], r["company_name"]) for r in names], "id long, name string")
    df_a = spark.createDataFrame(
        [(r["id"], r["company_name"]) for r in adj], "id long, name string")
    ck = StageCheckpoint(spark, tmp_path, "run-fingerprint-1")
    res = match_names(spark, df_a, df_b, "id", "name", "id", "name",
                      config=MatchConfig(threshold=0.0), checkpoint=ck)
    return ck, {(r["a_id"], r["b_id"]): round(r["score"], 9)
                for r in res.collect()}


def test_resume_reuses_stages_and_is_identical(spark, tmp_path):
    ck1, first = _run(spark, tmp_path)
    stamps = {m["stage"]: m["written_at_ms"] for m in ck1.metrics()}
    assert {"normalized_a", "normalized_b", "candidates", "scored",
            "matches"} <= set(stamps)

    # simulate a kill after the candidates stage: downstream stages lost
    for stage in ("scored", "matches"):
        (tmp_path / stage / "data" / "_SUCCESS").unlink()

    ck2, second = _run(spark, tmp_path)
    assert second == first
    stamps2 = {m["stage"]: m["written_at_ms"] for m in ck2.metrics()}
    # upstream stages resumed (not rewritten); downstream recomputed
    for stage in ("normalized_a", "normalized_b", "candidates"):
        assert stamps2[stage] == stamps[stage], f"{stage} was recomputed"
    for stage in ("scored", "matches"):
        assert stamps2[stage] > stamps[stage], f"{stage} was not recomputed"


def test_lineage_metrics_recorded(spark, tmp_path):
    ck, _ = _run(spark, tmp_path)
    by_stage = {m["stage"]: m for m in ck.metrics()}
    for stage, m in by_stage.items():
        assert m["rows_out"] > 0
        assert m["wall_ms"] >= 0
        # stage identity = input fingerprint + MatchConfig hash (round 2:
        # resuming under a changed config must not serve stale stages)
        assert m["input_fingerprint"].startswith("run-fingerprint-1|")
    meta = json.loads((tmp_path / "matches" / "meta.json").read_text())
    assert meta["rows_out"] == by_stage["matches"]["rows_out"]
