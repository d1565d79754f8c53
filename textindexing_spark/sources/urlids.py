"""Persistent url -> dense doc_id dimension — collision-free document
identity at any corpus size.

Round-1 used ``xxhash64(url)`` as the surrogate doc id. A 64-bit hash
collides with ~50% probability near 5e9 urls (birthday bound) — certain
at the 100 TB tier — and a collision silently merges two documents'
postings. This table assigns DENSE ids (0..n-1) instead, so ids are
collision-free by construction, maximally compact for the varbyte codec
(small gaps), and stable: a url keeps its id for the lifetime of the
index, and re-assigning the same batch is idempotent.

Scale path: new urls are assigned without any global sort or driver
loop. Urls hash into ``n_buckets`` groups; one tiny aggregation counts
each group; the driver turns those counts into per-bucket id offsets
(a <=n_buckets-row cumsum); each group then ranks its urls locally
(sorted, so the assignment is deterministic) and adds its offset. Two
narrow passes over only the NEW urls — existing mappings are never
rewritten (append-only versions, atomic LATEST swap).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

URLMAP_DDL = "url string, doc_id bigint"


class UrlIdTable:
    """Append-only url->doc_id dimension with versioned parquet storage."""

    def __init__(self, spark, path: str, n_buckets: int = 256):
        from textindexing_spark._pkg import ensure_shipped

        ensure_shipped(spark)
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        os.makedirs(path, exist_ok=True)

    def _latest(self) -> int | None:
        try:
            with open(f"{self.path}/LATEST") as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def mapping(self) -> DataFrame:
        """The full current url->doc_id mapping (union of all appended
        chunks up to the committed version)."""
        v = self._latest()
        if v is None:
            return self.spark.createDataFrame([], URLMAP_DDL)
        paths = [f"{self.path}/chunk{i}" for i in range(1, v + 1)]
        return self.spark.read.schema(URLMAP_DDL).parquet(*paths)

    def _next_id(self) -> int:
        v = self._latest()
        if v is None:
            return 0
        try:
            with open(f"{self.path}/NEXT_ID") as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            row = self.mapping().agg(
                F.max("doc_id").alias("m")).collect()[0]
            return int(row["m"] or -1) + 1

    def assign(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        """Return ``df`` with a ``doc_id`` column; unseen urls get fresh
        dense ids appended to the table first (atomic commit)."""
        if "doc_id" in df.columns:
            raise ValueError(
                "input already has a doc_id column — drop it before "
                "assign() (ids come from this dimension, not the input)")
        existing = self.mapping()
        new_urls = (df.select(F.col(url_col).alias("url"))
                    .where(F.col("url").isNotNull()).distinct()
                    .join(existing, "url", "left_anti"))
        n_new = new_urls.count()
        if n_new:
            base = self._next_id()
            bucket = F.pmod(F.xxhash64("url"),
                            F.lit(self.n_buckets)).cast("int")
            counts = {r["b"]: r["c"] for r in
                      new_urls.select(bucket.alias("b"))
                      .groupBy("b").agg(F.count("*").alias("c")).collect()}
            offsets = {}
            acc = base
            for b in sorted(counts):
                offsets[b] = acc
                acc += counts[b]

            def rank_bucket(pdf):
                import pandas as pd

                b = int(pdf["b"].iloc[0])
                pdf = pdf.sort_values("url", kind="mergesort")
                return pd.DataFrame({
                    "url": pdf["url"].to_numpy(),
                    "doc_id": offsets[b] + pd.RangeIndex(len(pdf))})

            assigned = (new_urls.withColumn("b", bucket)
                        .groupBy("b")
                        .applyInPandas(rank_bucket, URLMAP_DDL))
            v = (self._latest() or 0) + 1
            assigned.write.mode("overwrite").parquet(
                f"{self.path}/chunk{v}")
            tmp = f"{self.path}/NEXT_ID.tmp"
            with open(tmp, "w") as fh:
                fh.write(str(acc))
            os.replace(tmp, f"{self.path}/NEXT_ID")
            tmp = f"{self.path}/LATEST.tmp"
            with open(tmp, "w") as fh:
                fh.write(str(v))
            os.replace(tmp, f"{self.path}/LATEST")
        full = self.mapping()
        return df.join(full, df[url_col] == full["url"], "left") \
                 .drop(full["url"])
