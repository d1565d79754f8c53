#!/usr/bin/env python
"""Round-4 diagnostic: decompose the r3 bool/bm25 bench regressions.

Times each suspect stage separately at sf0.1 so the regression has a
named cause backed by data (VERDICT r3 'What's wrong' #2/#3 and next-
round item #4). Not part of the bench contract — a one-shot probe.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import make_spark  # noqa: E402


def t(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


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
    bool_texts = [q["query_text"] for q in qset if q["mode"] == "bool_and"]
    bm25_q = [(q["query_text"], q["k"]) for q in qset if q["mode"] == "bm25"]

    out = {}
    idx = build_index(spark, docs, IndexConfig())
    idx.cache()
    idx.postings.count()
    idx.documents.count()

    # 1. bool single-query path, cold (per-query df pre-pass jobs)
    out["bool_queries_cold"] = t(lambda: [
        idx.search_bool(q).collect() for q in bool_texts])
    # repeat: df cache now warm from run 1
    out["bool_queries_warm_cache"] = t(lambda: [
        idx.search_bool(q).collect() for q in bool_texts])

    # 2. prefetch, then the same queries on a FRESH Index (empty memo)
    from textindexing_spark.operators.query import Index
    idx2 = Index(spark, idx.postings, idx.documents, IndexConfig())
    out["prefetch"] = t(lambda: idx2.prepare_for_queries())
    out["bool_queries_prefetched"] = t(lambda: [
        idx2.search_bool(q).collect() for q in bool_texts])

    # 3. batched path decomposition
    idx3 = Index(spark, idx.postings, idx.documents, IndexConfig())
    out["bool_batch_cold"] = t(
        lambda: idx3.search_bool_many(bool_texts).collect())
    out["bool_batch_warm"] = t(
        lambda: idx3.search_bool_many(bool_texts).collect())
    idx4 = Index(spark, idx.postings, idx.documents,
                 IndexConfig(bool_seed_broadcast_max=0))
    out["bool_batch_noseed"] = t(
        lambda: idx4.search_bool_many(bool_texts).collect())
    idx5 = Index(spark, idx.postings, idx.documents, IndexConfig())
    idx5.prepare_for_queries()
    out["bool_batch_prefetched"] = t(
        lambda: idx5.search_bool_many(bool_texts).collect())

    # 4. bm25 Catalyst path
    idx.corpus_stats()
    out["bm25_queries"] = t(lambda: [
        idx.search_bm25(q, k).collect() for q, k in bm25_q])
    out["bm25_queries_2nd"] = t(lambda: [
        idx.search_bm25(q, k).collect() for q, k in bm25_q])

    # 5. positional build without the dropped repartition
    from textindexing_spark.operators.phrase import (
        PositionalIndex, PositionalSegmentIndex)
    out["positional_build"] = t(lambda: (
        PositionalIndex.build(spark, docs).cache().positional.count()))
    out["phrase_segment_build"] = t(lambda: (
        PositionalSegmentIndex.build(spark, docs, n_shards=16)
        .cache().segments.count()))

    # 6. fused segment build (regressed 2.8 -> 7.0 in r3)
    from textindexing_spark.operators.bm25 import build_segments_from_docs
    import tempfile
    d = tempfile.mkdtemp(prefix="tix_diag_")
    out["fused_segment_build"] = t(lambda: (
        build_segments_from_docs(spark, docs, IndexConfig(),
                                 n_shards=64).save(d)))
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
