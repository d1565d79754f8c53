"""Term-bucket-partitioned, copy-on-write boolean index store — the
O(delta) incremental merge path for operator A1 (incremental).

The reference's merge walks only the dictionary entries affected by the
merged document (merge-join over sorted terms, ImmutableIndex.cs:130-176);
everything else is structurally shared between the old and new immutable
index. The lake equivalent of that structural sharing is partition-level
copy-on-write — what Iceberg's MERGE INTO does with its file manifests.
This module implements the same contract directly over parquet:

    postings  split into ``n_term_buckets`` hash buckets of the term
              (pmod(xxhash64(term), B)) — the unit of rewrite;
    doc_tokens (doc_id, term, tf) forward table split into
              ``n_doc_buckets`` hash buckets of doc_id — the point-lookup
              that answers "which terms did this batch's docs have BEFORE
              the merge" without touching the whole index;
    documents (doc_id, doc_len) split by the same doc buckets;
    v{N}.json manifest mapping bucket -> parquet directory, committed
              with an atomic LATEST pointer swap (≙ the state-pointer
              swap, ImmutableIndex.cs:92-96).

A merge batch rewrites ONLY

    - the doc buckets owning the batch's doc ids, and
    - the term buckets owning the batch's affected terms
      (old terms of re-crawled/deleted docs ∪ new terms),

referencing every other bucket's existing files unchanged in the new
manifest — per-batch cost is O(delta + touched buckets), independent of
corpus size, and untouched buckets are byte-identical (the same files).
At 100 TB the bucket count scales with the corpus (e.g. 4096), keeping a
bucket at a comfortable task size; the rewrite of a bucket is one
partial+final hash-agg with the same skew salting as the bulk build.

Merge semantics are exactly ``Index.merge`` (IIndex.cs:116-119): a
re-merged doc REPLACES its postings, an empty token set DELETES the doc,
emptied terms disappear — gated by the streaming==bulk equivalence tests.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from textindexing_spark.config import IndexConfig
from textindexing_spark.operators.query import Index

POSTINGS_DDL = ("term string, df bigint, total_tf bigint, "
                "postings array<struct<doc_id:bigint,tf:int>>")
TOKENS_DDL = "doc_id bigint, term string, tf int"
DOCS_DDL = "doc_id bigint, doc_len bigint"

_TABLES = ("postings", "doc_tokens", "documents")


class BucketedIndexStore:
    """Snapshot-versioned boolean index with bucket-level copy-on-write
    merges. Same external surface as VersionedIndexStore (latest_version /
    versions / load -> Index) plus ``commit_merge`` which IS the merge —
    there is no full-index rewrite anywhere on this path."""

    def __init__(self, spark, root: str, cfg: IndexConfig | None = None,
                 n_term_buckets: int = 64, n_doc_buckets: int = 64):
        from textindexing_spark._pkg import ensure_shipped

        ensure_shipped(spark)
        self.spark = spark
        self.root = root
        self.cfg = cfg or IndexConfig()
        self.n_term_buckets = n_term_buckets
        self.n_doc_buckets = n_doc_buckets
        os.makedirs(root, exist_ok=True)

    # -- bucket functions (must stay stable across versions) --------------

    def _term_bucket(self):
        return F.pmod(F.xxhash64("term"),
                      F.lit(self.n_term_buckets)).cast("int")

    def _doc_bucket(self):
        return F.pmod(F.xxhash64("doc_id"),
                      F.lit(self.n_doc_buckets)).cast("int")

    # -- version bookkeeping ----------------------------------------------

    def latest_version(self) -> int | None:
        try:
            with open(f"{self.root}/LATEST") as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def versions(self) -> list[int]:
        return sorted(int(f[1:-5]) for f in os.listdir(self.root)
                      if f.startswith("v") and f.endswith(".json")
                      and f[1:-5].isdigit())

    def manifest(self, version: int | None = None) -> dict | None:
        v = self.latest_version() if version is None else version
        if v is None:
            return None
        with open(f"{self.root}/v{v}.json") as fh:
            return json.load(fh)

    # -- readers ----------------------------------------------------------

    def _read(self, paths: list[str], ddl: str) -> DataFrame:
        if not paths:
            return self.spark.createDataFrame([], ddl)
        return self.spark.read.schema(ddl).parquet(*paths)

    def load(self, version: int | None = None) -> Index:
        m = self.manifest(version)
        if m is None:
            from textindexing_spark.sources.catalog import empty_index

            return empty_index(self.spark, self.cfg)
        return Index(self.spark,
                     self._read(list(m["postings"].values()), POSTINGS_DDL),
                     self._read(list(m["documents"].values()), DOCS_DDL),
                     self.cfg)

    # -- the O(delta) merge ------------------------------------------------

    def commit_merge(self, docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> int:
        """Merge a document batch (Index.merge semantics) into a NEW
        version, rewriting only the buckets the batch touches."""
        from pyspark import StorageLevel

        from textindexing_spark.operators.build import (
            document_lengths, postings_from_tokens, tokenize_documents)

        prev = self.manifest() or {t: {} for t in _TABLES}
        v = (self.latest_version() or 0) + 1
        vdir = f"{self.root}/v{v}_data"

        new_tokens = (tokenize_documents(docs, self.cfg, id_col=id_col,
                                         text_col=text_col)
                      .persist(StorageLevel.MEMORY_AND_DISK))
        batch_ids = (docs.select(F.col(id_col).alias("doc_id")).distinct()
                     .persist(StorageLevel.MEMORY_AND_DISK))

        # doc buckets owning the batch ids — old rows of re-crawled docs
        # and all new rows land in exactly these buckets
        touched_db = sorted(
            r["db"] for r in batch_ids
            .select(self._doc_bucket().alias("db")).distinct().collect())
        db_set = set(touched_db)
        old_dt = self._read(
            [p for k, p in prev["doc_tokens"].items() if int(k) in db_set],
            TOKENS_DDL)

        # affected terms: what the batch docs HAD (forward-table point
        # lookup, pruned to the batch's doc buckets) ∪ what they have now
        affected_terms = (old_dt.join(F.broadcast(batch_ids), "doc_id")
                          .select("term")
                          .union(new_tokens.select("term")))
        touched_tb = sorted(
            r["tb"] for r in affected_terms
            .select(self._term_bucket().alias("tb")).distinct().collect())
        tb_set = set(touched_tb)

        # rewrite touched term buckets: decode them, drop the batch docs,
        # add the fresh tokens, re-aggregate (salting per cfg)
        old_postings = self._read(
            [p for k, p in prev["postings"].items() if int(k) in tb_set],
            POSTINGS_DDL)
        old_tokens_kept = (
            old_postings.select("term", F.explode("postings").alias("p"))
            .select(F.col("p.doc_id").alias("doc_id"), "term",
                    F.col("p.tf").alias("tf"))
            .join(F.broadcast(batch_ids), "doc_id", "left_anti"))
        tokens_all = old_tokens_kept.unionByName(new_tokens)
        (postings_from_tokens(tokens_all, self.cfg)
         .withColumn("tb", self._term_bucket())
         .write.mode("overwrite").partitionBy("tb")
         .parquet(f"{vdir}/postings"))

        # rewrite touched doc buckets of the forward table + documents
        kept_dt = old_dt.join(F.broadcast(batch_ids), "doc_id", "left_anti")
        (kept_dt.unionByName(new_tokens)
         .withColumn("db", self._doc_bucket())
         .write.mode("overwrite").partitionBy("db")
         .parquet(f"{vdir}/doc_tokens"))

        old_docs = self._read(
            [p for k, p in prev["documents"].items() if int(k) in db_set],
            DOCS_DDL)
        kept_docs = old_docs.join(F.broadcast(batch_ids), "doc_id",
                                  "left_anti")
        (kept_docs.unionByName(document_lengths(new_tokens))
         .withColumn("db", self._doc_bucket())
         .write.mode("overwrite").partitionBy("db")
         .parquet(f"{vdir}/documents"))

        new_tokens.unpersist()
        batch_ids.unpersist()

        # manifest: inherit every untouched bucket's existing files; a
        # touched bucket maps to its fresh directory, or disappears if the
        # merge emptied it (partitionBy writes no dir for absent values)
        man = {t: dict(prev[t]) for t in _TABLES}
        for k in touched_tb:
            man["postings"].pop(str(k), None)
            d = f"{vdir}/postings/tb={k}"
            if os.path.isdir(d):
                man["postings"][str(k)] = d
        for k in touched_db:
            for t, part in (("doc_tokens", "db"), ("documents", "db")):
                man[t].pop(str(k), None)
                d = f"{vdir}/{t}/{part}={k}"
                if os.path.isdir(d):
                    man[t][str(k)] = d

        tmp = f"{self.root}/v{v}.json.tmp"
        with open(tmp, "w") as fh:
            json.dump(man, fh)
        os.replace(tmp, f"{self.root}/v{v}.json")
        tmp = f"{self.root}/LATEST.tmp"
        with open(tmp, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, f"{self.root}/LATEST")
        return v
