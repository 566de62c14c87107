"""Structured-Streaming incremental linkage and dedup.

The key correctness claim: every blocking/scoring stage is fit on the
master side only, so micro-batch boundaries cannot change match decisions
-- the streamed output equals the one-shot batch output row for row.
Resume: the streaming checkpoint's committed-batch log means a second
availableNow run processes only files that arrived since the first.
"""

import os

import pytest
from pyspark.sql import functions as F

from name_matching_spark.pipeline import MatchConfig, match_names
from name_matching_spark.streaming.incremental import (
    incremental_match,
    stream_pages,
    streaming_exact_dedup,
    write_query_segments,
)

CFG = MatchConfig(threshold=50.0, top_n=5, prefix_size=None)


def _corpus(spark):
    """Deterministic master/query name tables (typo'd twins)."""
    masters = [(i, f"acme widgets number {i} incorporated") for i in
               range(40)]
    queries = [(i, f"acme widgets number {i} incorporatd") for i in
               range(0, 40, 2)]
    m = spark.createDataFrame(masters, "id long, name string")
    q = spark.createDataFrame(queries, "id long, name string")
    return m, q


def _rows(df):
    return sorted(
        (r["a_id"], r["b_id"], round(r["score"], 6), r["source"])
        for r in df.collect())


def test_incremental_match_equals_batch(spark, tmp_path):
    m, q = _corpus(spark)
    seg_dir = str(tmp_path / "segments")
    out_dir = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")
    write_query_segments(q, seg_dir, n_segments=3)
    assert len([f for f in os.listdir(seg_dir)
                if f.endswith(".parquet")]) == 3
    stream = stream_pages(spark, seg_dir, schema="id long, name string",
                          max_files_per_trigger=1)
    sq = incremental_match(stream, m, "id", "name", "id", "name",
                           output_dir=out_dir, checkpoint_dir=ckpt,
                           config=CFG)
    # three files x maxFilesPerTrigger=1 -> multiple micro-batches ran
    # (>=2 guards against one hash-split segment landing empty)
    assert len([p for p in sq.recentProgress if p["numInputRows"] > 0]) >= 2
    streamed = spark.read.parquet(out_dir).select(
        "a_id", "b_id", "score", "source")
    batch = match_names(spark, q, m, "id", "name", "id", "name",
                        config=CFG).select("a_id", "b_id", "score", "source")
    assert _rows(streamed) == _rows(batch)
    assert len(_rows(streamed)) >= 20       # every query found its twin


def test_incremental_resume_processes_only_new_segments(spark, tmp_path):
    m, q = _corpus(spark)
    seg_dir = str(tmp_path / "segments")
    out_dir = str(tmp_path / "matches")
    ckpt = str(tmp_path / "ckpt")
    write_query_segments(q, seg_dir, n_segments=2)
    stream = stream_pages(spark, seg_dir, schema="id long, name string")
    incremental_match(stream, m, "id", "name", "id", "name",
                      output_dir=out_dir, checkpoint_dir=ckpt, config=CFG)
    n_first = spark.read.parquet(out_dir).count()
    assert n_first > 0

    # a new segment lands (fresh ids 1000+); restart with SAME checkpoint
    late = spark.createDataFrame(
        [(1000 + i, f"acme widgets number {i} incorporatd")
         for i in range(1, 40, 2)], "id long, name string")
    write_query_segments(late, str(tmp_path / "late"), n_segments=1)
    os.rename(str(tmp_path / "late" / "seg_0.parquet"),
              os.path.join(seg_dir, "seg_late.parquet"))
    stream2 = stream_pages(spark, seg_dir, schema="id long, name string")
    incremental_match(stream2, m, "id", "name", "id", "name",
                      output_dir=out_dir, checkpoint_dir=ckpt, config=CFG)
    out = spark.read.parquet(out_dir)
    # committed batches were NOT reprocessed: old rows appear exactly once
    old = out.filter(F.col("a_id") < 1000)
    assert old.count() == n_first
    assert old.groupBy("a_id", "b_id").count().filter(
        F.col("count") > 1).count() == 0
    # and the late segment's queries matched
    assert out.filter(F.col("a_id") >= 1000).count() >= 15


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    docs = [(i, f"document body {i % 10}") for i in range(50)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    seg_dir = str(tmp_path / "segments")
    out_dir = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt")
    write_query_segments(d, seg_dir, n_segments=3)
    stream = stream_pages(spark, seg_dir, schema="doc_id long, text string",
                          max_files_per_trigger=1)
    streaming_exact_dedup(stream, "doc_id", "text",
                          output_dir=out_dir, checkpoint_dir=ckpt)
    out = spark.read.parquet(out_dir)
    # state store carries seen-hashes ACROSS micro-batches: one survivor
    # per distinct text globally, not per segment
    assert out.count() == 10
    assert out.select("text").distinct().count() == 10


def test_incremental_match_rejects_corpus_global_config(spark, tmp_path):
    m, q = _corpus(spark)
    with pytest.raises(ValueError, match="micro-batch"):
        incremental_match(
            q, m, "id", "name", "id", "name",
            output_dir=str(tmp_path / "o"),
            checkpoint_dir=str(tmp_path / "c"),
            config=MatchConfig(preprocess_split=True))
