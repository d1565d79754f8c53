"""Deterministic sampling / splits / mixture building: reproducibility,
rate monotonicity, split partition laws, and token-budget accuracy."""

import pytest
from pyspark.sql import functions as F

from textindexing_spark.functions.sampling import (
    hash_sample, hash_split, mixture_plan, mixture_sample)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 4}", "tok " * (10 + i % 50)) for i in range(2000)]
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, text string").cache()


def test_sample_deterministic_and_partition_independent(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=7).collect()}
    b = {r["doc_id"] for r in
         hash_sample(docs.repartition(13), 0.3, seed=7).collect()}
    assert a == b and a
    # a different seed selects a different (same-sized-ish) set
    c = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=8).collect()}
    assert c != a


def test_sample_rate_monotone_and_calibrated(docs):
    small = {r["doc_id"] for r in hash_sample(docs, 0.2).collect()}
    big = {r["doc_id"] for r in hash_sample(docs, 0.6).collect()}
    assert small <= big          # raising the rate only ADDS documents
    n = docs.count()
    assert abs(len(small) / n - 0.2) < 0.05
    assert abs(len(big) / n - 0.6) < 0.05
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == n
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_split_partitions_exactly(docs):
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                     seed=3)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n"))
              .collect()}
    n = docs.count()
    assert sum(counts.values()) == n          # total partition
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.05
    # growing a LATER bucket at the expense of the last one never
    # reassigns rows out of the earlier buckets
    t1 = {r["doc_id"] for r in out.where("split = 'train'").collect()}
    out2 = hash_split(docs, {"train": 0.8, "val": 0.15, "test": 0.05},
                      seed=3)
    t2 = {r["doc_id"] for r in out2.where("split = 'train'").collect()}
    assert t1 == t2
    with pytest.raises(ValueError):
        hash_split(docs, {})


def test_mixture_plan_and_budget(docs):
    shares = {"src0": 2.0, "src1": 1.0, "src2": 1.0}  # src3 dropped
    budget = 20_000
    plan = {r["source"]: r for r in
            mixture_plan(docs, shares, budget).collect()}
    assert set(plan) == set(shares)
    assert plan["src0"]["share"] == pytest.approx(0.5)
    assert plan["src0"]["target_tokens"] == budget // 2
    for r in plan.values():
        assert 0.0 <= r["rate"] <= 1.0
    sampled = mixture_sample(docs, shares, budget, seed=5)
    got = {r["source"]: r["t"] for r in sampled.groupBy("source").agg(
        F.expr("sum(size(split(text, '\\\\s+')))").alias("t")).collect()}
    assert "src3" not in got                  # unlisted source dropped
    for s, share in (("src0", 0.5), ("src1", 0.25), ("src2", 0.25)):
        assert got[s] == pytest.approx(budget * share, rel=0.15), s


def test_mixture_rate_caps_at_one(spark):
    docs = spark.createDataFrame(
        [(0, "tiny", "only three tokens"), (1, "big", "tok " * 1000)],
        "doc_id bigint, source string, text string")
    plan = {r["source"]: r for r in
            mixture_plan(docs, {"tiny": 1.0, "big": 1.0},
                         100_000).collect()}
    assert plan["tiny"]["rate"] == 1.0        # under-fills, no dup
    sampled = mixture_sample(docs, {"tiny": 1.0, "big": 1.0}, 100_000)
    assert sampled.where("source = 'tiny'").count() == 1
