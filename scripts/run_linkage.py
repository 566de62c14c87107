#!/usr/bin/env python
"""spark-submit entry point for the record-linkage pipeline.

Cluster usage (the north-rule launch shape):

    cd /root/repo && zip -qr /tmp/nm_spark.zip name_matching_spark
    spark-submit --driver-memory 48g \
        --py-files /tmp/nm_spark.zip scripts/run_linkage.py \
        --pages-a s3://bucket/pages_a --pages-b s3://bucket/pages_b \
        --output s3://bucket/matches \
        --checkpoint-dir s3://bucket/checkpoints/run1 \
        --threshold 95 --cluster

NOTE on memory: under spark-submit the JVM is already running before this
script executes, so `spark.driver.memory` from the in-code session builder
CANNOT take effect -- pass --driver-memory (and --executor-memory on a
real cluster) on the spark-submit command line.  In LOCAL mode the driver
heap is also the executor heap for every task thread; the 1g default OOMs
around ~20k+ pages on local[32].  The script warns when it detects this.

Inputs are parquet tables with the BASELINE input_hint schema
(url, warc_ts, html, text, lang).  A killed job relaunched with the same
--checkpoint-dir resumes from the last complete stage.  With --demo N the
inputs are replaced by the deterministic synthetic pages corpus (N
entities), useful for smoke tests without data.

STREAMING mode (continuous ingest): point --stream-pages-a at the
directory where crawl segments land and pass --stream-checkpoint;
each new parquet file is matched as a micro-batch against the static
--pages-b masters and appended to --output.  Relaunching with the same
--stream-checkpoint processes only segments that arrived since the last
run (exactly-once, no duplicate pairs):

    spark-submit --driver-memory 16g --py-files /tmp/nm_spark.zip \
        scripts/run_linkage.py \
        --stream-pages-a s3://bucket/segments --pages-b s3://bucket/masters \
        --output s3://bucket/matches \
        --stream-checkpoint s3://bucket/stream_ck --threshold 95
"""

from __future__ import annotations

import argparse
import sys

from pyspark.errors import AnalysisException


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages-a", help="parquet path of the query pages table")
    p.add_argument("--pages-b", help="parquet path of the master pages table")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--threshold", type=float, default=95.0)
    p.add_argument("--top-n", type=int, default=50)
    p.add_argument("--df-cap-frac", type=float, default=0.25,
                   help="drop n-grams with df above this fraction of docs "
                        "from the blocking join (skew control)")
    p.add_argument("--cluster", action="store_true",
                   help="emit transitive entity clusters instead of edges")
    p.add_argument("--preprocess-split", action="store_true")
    p.add_argument("--prefix-size", type=int, default=None,
                   help="force the prefix-filtered blocker with this many "
                        "rare grams per doc (default: auto-switch above "
                        "--auto-prefix-threshold docs per block)")
    p.add_argument("--auto-prefix-threshold", type=int, default=4_000)
    p.add_argument("--number-of-matches", type=int, default=1,
                   help="alternatives per query; equals the metric-group "
                        "or metric count -> per-group / per-metric ranking "
                        "(reference _rate_matches dispatch)")
    p.add_argument("--legal-suffixes", action="store_true",
                   help="postprocess: rescore winners with legal-form "
                        "words stripped")
    p.add_argument("--common-words", action="store_true",
                   help="postprocess: rescore winners with corpus-common "
                        "words stripped")
    p.add_argument("--demo", type=int, default=0,
                   help="run on N synthetic entities instead of real input")
    p.add_argument("--stream-pages-a", default=None,
                   help="STREAMING mode: directory where query-page "
                        "parquet segments land; each new file becomes a "
                        "micro-batch matched against the static --pages-b "
                        "masters (foreachBatch, exactly-once via "
                        "--stream-checkpoint).  Drains available files "
                        "then exits; relaunch resumes from the streaming "
                        "checkpoint and processes only new segments")
    p.add_argument("--stream-checkpoint", default=None,
                   help="streaming checkpoint location (required with "
                        "--stream-pages-a)")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from name_matching_spark.checkpoint import StageCheckpoint
    from name_matching_spark.pipeline import MatchConfig, match_pages
    from name_matching_spark.session import get_spark

    spark = get_spark("nm-linkage")
    # under spark-submit, driver memory is fixed at JVM launch; in local
    # mode that heap also serves every executor task thread
    jvm_max = spark.sparkContext._jvm.java.lang.Runtime.getRuntime() \
        .maxMemory()
    cores = spark.sparkContext.defaultParallelism
    if spark.sparkContext.master.startswith("local") and \
            jvm_max < cores * 512 * 1024 * 1024:
        print(f"WARNING: local[{cores}] with only "
              f"{jvm_max // (1024 ** 2)} MiB driver heap "
              f"(< 512 MiB/core) -- large inputs will OOM; relaunch with "
              f"spark-submit --driver-memory (e.g. 48g)", file=sys.stderr)
    if args.demo:
        from name_matching_spark.sources.pages import spark_pages_df
        pages = spark_pages_df(spark, entities=args.demo, variants=2)
        pages_a = pages.filter(F.col("variant_id") == 1)
        pages_b = pages.filter(F.col("variant_id") == 0)
    elif args.stream_pages_a:
        if not args.pages_b:
            p.error("--pages-b (static masters) required with "
                    "--stream-pages-a")
        pages_a = None
        pages_b = spark.read.parquet(args.pages_b)
    else:
        if not (args.pages_a and args.pages_b):
            p.error("--pages-a/--pages-b required unless --demo")
        pages_a = spark.read.parquet(args.pages_a)
        pages_b = spark.read.parquet(args.pages_b)

    ck = None
    if args.checkpoint_dir:
        fingerprint = f"a={args.pages_a},b={args.pages_b},demo={args.demo}," \
                      f"t={args.threshold},k={args.top_n}"
        ck = StageCheckpoint(spark, args.checkpoint_dir, fingerprint)

    cfg = MatchConfig(top_n=args.top_n, threshold=args.threshold,
                      df_cap_frac=args.df_cap_frac,
                      preprocess_split=args.preprocess_split,
                      prefix_size=args.prefix_size,
                      auto_prefix_threshold=args.auto_prefix_threshold,
                      number_of_matches=args.number_of_matches,
                      legal_suffixes=args.legal_suffixes,
                      common_words=args.common_words)
    if args.stream_pages_a:
        if not args.stream_checkpoint:
            p.error("--stream-checkpoint required with --stream-pages-a")
        if args.cluster:
            p.error("--cluster needs the full edge set; run the batch "
                    "clusterer over the streamed match output instead")
        from name_matching_spark.streaming.incremental import (
            incremental_match_pages, stream_pages)
        stream = stream_pages(spark, args.stream_pages_a)
        # --checkpoint-dir doubles as the fitted-master store in streaming
        # mode: a relaunched driver reloads the fit instead of rescanning
        # the master table
        incremental_match_pages(
            stream, pages_b, output_dir=args.output,
            checkpoint_dir=args.stream_checkpoint, config=cfg,
            fit_checkpoint=ck)
    else:
        out = match_pages(spark, pages_a, pages_b, config=cfg,
                          checkpoint=ck, cluster=args.cluster)
        out.write.mode("overwrite").parquet(args.output)
    try:
        n = spark.read.parquet(args.output).count()
    except AnalysisException as e:
        # streaming mode with zero micro-batches/matches never creates the
        # output path; that's a successful empty run, not a crash.  Only
        # the missing-path case qualifies -- corrupt output, permission
        # failures, etc. must surface.
        missing = ("PATH_NOT_FOUND" in str(e)
                   or "Path does not exist" in str(e))
        if not (args.stream_pages_a and missing):
            raise
        n = 0
    print(f"wrote {n} rows to {args.output}")
    if ck:
        for m in ck.metrics():
            print("stage", m["stage"], "rows", m["rows_out"],
                  "wall_ms", m["wall_ms"])
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
