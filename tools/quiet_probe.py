"""Focused quiet-window probe for the two most contention-sensitive
measurements: the saturated local[32] scoring leg and q7 prefix blocking.

The full bench takes ~25 min; on a shared host whose external tenants come
in minutes-to-hour windows, a full run rarely fits inside one quiet window.
This probe re-measures just the contested legs in a few minutes so a clean
number can be captured (with its load context) whenever the box goes idle:

    python tools/quiet_probe.py [pairs_path]

Prints one JSON line.  Used for the round-3 BENCH.md quiet-window
confirmation (135,449 pairs/s at local[32], captured at load 0.15 between
external windows).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _fresh_spark, time_scoring  # noqa: E402


def probe_scoring(pairs_path: str) -> dict:
    out = {"load_before": [round(x, 2) for x in os.getloadavg()]}
    runs32, runs8 = [], []
    for _ in range(2):
        runs32.append(time_scoring(32, pairs_path, trials=2))
        runs8.append(time_scoring(8, pairs_path, trials=2))
    hi = min(runs32, key=lambda r: r["sec"])
    lo = min(runs8, key=lambda r: r["sec"])
    out.update({
        "pairs_per_sec_32": hi["pairs_per_sec"],
        "pairs_per_sec_8": lo["pairs_per_sec"],
        "sat_speedup": round(lo["sec"] / hi["sec"], 3),
        "sat_efficiency": round(lo["sec"] / hi["sec"] / 4, 3),
        "runs32_sec": [r["sec"] for r in runs32],
        "runs8_sec": [r["sec"] for r in runs8],
        "load_after": [round(x, 2) for x in os.getloadavg()],
    })
    return out


def probe_q7(trials: int = 2) -> dict:
    from pyspark.sql import functions as F

    from name_matching_spark.functions.extract import extract_name
    from name_matching_spark.functions.normalize import preprocess_udf
    from name_matching_spark.operators.blocking import prefix_filtered_top_n
    from name_matching_spark.operators.tfidf import (
        doc_count_table, explode_char_ngrams, idf_table, master_weights,
        query_weights, with_group)
    from name_matching_spark.sources.pages import spark_pages_df

    spark = _fresh_spark(32, shuffle=64)
    out = {"q7_secs": [], "q7_loads": []}
    try:
        for _ in range(trials):
            t0 = time.time()
            pgs = spark_pages_df(spark, entities=20000, variants=2)
            pp = preprocess_udf()
            names = pgs.select(
                "url", "variant_id",
                pp(extract_name(F.col("html"),
                                F.col("text"))).alias("name")).persist()
            names.count()
            m = with_group(names.filter(F.col("variant_id") == 0)
                           .select(F.col("url").alias("id"), "name"), None)
            q = with_group(names.filter(F.col("variant_id") == 1)
                           .select(F.col("url").alias("id"), "name"), None)
            m_tf = explode_char_ngrams(m, "id", "name")
            q_tf = explode_char_ngrams(q, "id", "name")
            idf = idf_table(m_tf, doc_count_table(m, "id"))
            prefix_filtered_top_n(
                query_weights(q_tf, idf), master_weights(m_tf, idf), idf,
                top_n=50, prefix_size=6, df_cap_frac=0.2).count()
            names.unpersist()
            out["q7_secs"].append(round(time.time() - t0, 1))
            out["q7_loads"].append(
                [round(x, 2) for x in os.getloadavg()])
    finally:
        spark.stop()
    return out


if __name__ == "__main__":
    pairs = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nm_bench/pairs_16000"
    res = probe_scoring(pairs)
    if "--with-q7" in sys.argv:
        res.update(probe_q7())
    print(json.dumps(res))
