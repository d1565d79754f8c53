#!/usr/bin/env python
"""Correlate per-sample query wall time with hypervisor steal time.

Runs the same fixed bm25/bool query loops N times in one session and
records, per sample, wall seconds plus the /proc/stat steal and idle
jiffy deltas. If slow samples coincide with steal spikes the r3 bench
regressions are machine contention, not plan changes (VERDICT item 4).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import make_spark  # noqa: E402


def cpu_jiffies():
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    # user nice system idle iowait irq softirq steal
    return int(f[4]), int(f[8])  # idle, steal


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = int(os.environ.get("N_SAMPLES", "7"))
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from textindexing_spark import IndexConfig, build_index

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(int(cpus)).cache())
    docs.count()
    with open(f"{REPO}/fixtures/queries.json") as fh:
        qset = json.load(fh)
    bool_texts = [q["query_text"] for q in qset if q["mode"] == "bool_and"]
    bm25_q = [(q["query_text"], q["k"]) for q in qset if q["mode"] == "bm25"]

    idx = build_index(spark, docs, IndexConfig()).cache()
    idx.postings.count()
    idx.documents.count()
    idx.prepare_for_queries()
    idx.corpus_stats()

    samples = []
    for i in range(n):
        for name, fn in (
                ("bm25", lambda: [idx.search_bm25(q, k).collect()
                                  for q, k in bm25_q]),
                ("bool", lambda: [idx.search_bool(q).collect()
                                  for q in bool_texts]),
                ("bool_batch",
                 lambda: idx.search_bool_many(bool_texts).collect())):
            i0, s0 = cpu_jiffies()
            t0 = time.perf_counter()
            fn()
            wall = time.perf_counter() - t0
            i1, s1 = cpu_jiffies()
            samples.append({"i": i, "q": name, "wall": round(wall, 3),
                            "steal_j": s1 - s0, "idle_j": i1 - i0})
    print(json.dumps(samples, indent=0))
    spark.stop()


if __name__ == "__main__":
    main()
