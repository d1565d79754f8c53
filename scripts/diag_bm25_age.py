#!/usr/bin/env python
"""Does the Catalyst bm25 path slow down with session age (caches,
broadcasts, python workers accumulated by earlier suite rows)?
Runs the same 22-query bm25 loop before and after the phrase builds."""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import make_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from textindexing_spark import IndexConfig, build_index

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(int(cpus)).cache())
    docs.count()
    with open(f"{REPO}/fixtures/queries.json") as fh:
        qset = json.load(fh)
    bm25_q = [(q["query_text"], q["k"]) for q in qset
              if q["mode"] == "bm25"]

    idx = build_index(spark, docs, IndexConfig()).cache()
    idx.postings.count()
    idx.documents.count()
    idx.prepare_for_queries()
    idx.corpus_stats()

    def bm25_loop():
        t0 = time.perf_counter()
        for q, k in bm25_q:
            idx.search_bm25(q, k).collect()
        return round(time.perf_counter() - t0, 3)

    out = {"fresh": [bm25_loop() for _ in range(3)]}

    # simulate the suite rows that run before bm25 in bench.py
    from textindexing_spark.operators.phrase import (
        PositionalIndex, PositionalSegmentIndex)
    for q in qset:
        if q["mode"] == "bool_and":
            idx.search_bool(q["query_text"]).collect()
    p = PositionalIndex.build(spark, docs).cache()
    p.positional.count()
    for ph in ("row scan", "the data table", "merge batch"):
        p.search_phrase(ph).collect()
    p.unpersist()
    s = PositionalSegmentIndex.build(spark, docs, n_shards=16).cache()
    s.segments.count()
    s.search_phrase_many(["row scan", "the data table"]).collect()
    s.unpersist()

    out["aged"] = [bm25_loop() for _ in range(3)]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
