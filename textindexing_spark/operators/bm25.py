"""BM25 top-k over compressed index segments with block-max WAND pruning.

This is the engine's scale path for ranked retrieval (SURVEY.md section
7.2 M4/M5) — the part Catalyst has no primitive for, implemented as
explicit dataflow:

- the index is **document-sharded**: shard = pmod(doc_id, S). Every shard
  holds the varbyte-compressed postings of every term for its doc range
  plus that range's doc lengths — so a query evaluates shard-locally with
  NO join and NO shuffle of postings: one mapInPandas-style task per
  shard, then a tiny distributed top-k reduce (orderBy+limit =
  TakeOrderedAndProject over <= S*k rows).
- per posting block (block_size docs) we store skip metadata:
  (last_doc, byte offsets, n, max_tf, max_score) where max_score is the
  block's true max BM25 partial tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl)) —
  computed at build time when dl is at hand. ub(term, block) =
  idf * max_score is the tight block-max bound WAND skips with.
- scoring runs block-max WAND (Broder et al. 2003; Ding & Suel 2011
  "Faster top-k document retrieval using block-max indexes"): terms
  sorted by current doc, pivot chosen where cumulative upper bounds reach
  the heap threshold, block-level bound check before any decode of
  non-pivot terms.

Correctness contract: identical top-k doc ids and scores (to float
addition-order noise) as the pure-Catalyst ``Index.search_bm25`` — tested
in tests/test_wand.py.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

from textindexing_spark.config import IndexConfig
from textindexing_spark.operators import codec

SEGMENT_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("term", T.StringType()),
    T.StructField("n_docs", T.LongType()),
    T.StructField("gaps", T.BinaryType()),
    T.StructField("tfs", T.BinaryType()),
    T.StructField("blocks", T.ArrayType(T.StructType([
        T.StructField("last_doc", T.LongType()),
        T.StructField("gap_off", T.IntegerType()),
        T.StructField("tf_off", T.IntegerType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("max_score", T.DoubleType()),
    ]))),
])

SHARD_DOCS_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("doc_ids", T.BinaryType()),
    T.StructField("doc_lens", T.BinaryType()),
    T.StructField("n", T.IntegerType()),
])


def _bm25_partial(tf, dl, k1: float, b: float, avgdl: float):
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


class SegmentIndex:
    """Compressed, document-sharded inverted index for ranked retrieval."""

    def __init__(self, spark, segments: DataFrame, shard_docs: DataFrame,
                 term_stats: DataFrame, n_docs: int, avgdl: float,
                 cfg: IndexConfig):
        self.spark = spark
        self.segments = segments
        self.shard_docs = shard_docs
        self.term_stats = term_stats  # (term, df) global document frequency
        self.n_docs = n_docs
        self.avgdl = avgdl
        self.cfg = cfg

    def cache(self) -> "SegmentIndex":
        self.segments = self.segments.cache()
        self.shard_docs = self.shard_docs.cache()
        self.term_stats = self.term_stats.cache()
        return self

    def save(self, path: str) -> None:
        # physically cluster by shard so a query task reads one file group
        self.segments.repartition("shard").sortWithinPartitions(
            "shard", "term").write.mode("overwrite").parquet(f"{path}/segments")
        self.shard_docs.write.mode("overwrite").parquet(f"{path}/shard_docs")
        self.term_stats.write.mode("overwrite").parquet(f"{path}/term_stats")

    # -- query -----------------------------------------------------------

    def idf(self, df_t: int) -> float:
        return math.log(1.0 + (self.n_docs - df_t + 0.5) / (df_t + 0.5))

    def search_bm25(self, query_text: str, k: int | None = None,
                    prune: bool = True) -> DataFrame:
        """Block-max-WAND top-k: per-shard pruned evaluation + global
        top-k reduce. Returns (doc_id, score) ordered score desc, doc_id."""
        from textindexing_spark._pkg import ensure_shipped
        from textindexing_spark.functions.tokenize import tokenize_text

        ensure_shipped(self.spark)
        k = k or self.cfg.default_k
        terms = sorted(set(tokenize_text(query_text, self.cfg.tokenizer,
                                         self.cfg.case_insensitive)))
        out_schema = "doc_id bigint, score double"
        if not terms:
            return self.spark.createDataFrame([], out_schema)
        stats = {r["term"]: r["df"] for r in
                 self.term_stats.where(F.col("term").isin(terms)).collect()}
        idfs = {t: self.idf(df_t) for t, df_t in stats.items()}
        if not idfs:
            return self.spark.createDataFrame([], out_schema)
        k1, b, avgdl = self.cfg.bm25.k1, self.cfg.bm25.b, self.avgdl

        def shard_topk(seg, docs):
            import pandas as pd

            if seg.empty or docs.empty:
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float64")})
            dl_ids = codec.varbyte_decode(
                np.frombuffer(docs["doc_ids"].iloc[0], dtype=np.uint8))
            dl_vals = codec.varbyte_decode(
                np.frombuffer(docs["doc_lens"].iloc[0], dtype=np.uint8))
            top = _wand_shard(seg, dl_ids, dl_vals, idfs, k, k1, b, avgdl,
                              prune)
            return pd.DataFrame(
                {"doc_id": pd.Series([d for d, _ in top], dtype="int64"),
                 "score": pd.Series([s for _, s in top], dtype="float64")})

        seg_q = self.segments.where(F.col("term").isin(list(idfs)))
        per_shard = (seg_q.groupby("shard")
                     .cogroup(self.shard_docs.groupby("shard"))
                     .applyInPandas(shard_topk, out_schema))
        return (per_shard
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))


class _TermIter:
    """Lazy block-decoding posting iterator with next_geq skipping."""

    __slots__ = ("gaps", "tfs", "blocks", "lasts", "idf", "bi", "pos",
                 "docs", "tfvals", "done", "global_ub")

    def __init__(self, gaps, tfs, blocks, idf, k1, b, avgdl):
        self.gaps = gaps
        self.tfs = tfs
        self.blocks = blocks
        self.lasts = np.array([bl["last_doc"] for bl in blocks],
                              dtype=np.int64)
        self.idf = idf
        self.global_ub = idf * max(bl["max_score"] for bl in blocks)
        self.bi = -1
        self.done = False
        self._load(0)

    def _load(self, bi: int) -> None:
        if bi >= len(self.blocks):
            self.done = True
            return
        self.bi = bi
        self.docs, self.tfvals = codec.decode_block(
            self.gaps, self.tfs, self.blocks, bi)
        self.pos = 0

    @property
    def cur(self) -> int:
        return int(self.docs[self.pos])

    @property
    def cur_tf(self) -> int:
        return int(self.tfvals[self.pos])

    def block_ub(self) -> float:
        return self.idf * self.blocks[self.bi]["max_score"]

    def block_last(self) -> int:
        return int(self.lasts[self.bi])

    def next_geq(self, target: int) -> None:
        """Advance to the first posting with doc >= target (block skip)."""
        if self.done:
            return
        if target > self.lasts[self.bi]:
            nbi = int(np.searchsorted(self.lasts, target, side="left"))
            if nbi >= len(self.blocks):
                self.done = True
                return
            self._load(nbi)
        p = int(np.searchsorted(self.docs[self.pos:], target,
                                side="left")) + self.pos
        if p >= len(self.docs):  # target beyond this block's tail
            self._load(self.bi + 1)
        else:
            self.pos = p

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.docs):
            self._load(self.bi + 1)


def _wand_shard(seg, dl_ids, dl_vals, idfs, k, k1, b, avgdl, prune):
    """Block-max WAND over one shard's compressed segments.
    Returns the shard's top-k [(doc_id, score)] (score desc, doc asc)."""
    dl_lookup_ids = dl_ids
    iters = []
    for _, row in seg.iterrows():
        blocks = list(row["blocks"])
        if not blocks:
            continue
        iters.append(_TermIter(bytes(row["gaps"]), bytes(row["tfs"]),
                               blocks, idfs[row["term"]], k1, b, avgdl))
    heap: list[tuple[float, int]] = []  # (score, -doc) min-heap of top-k
    theta = -math.inf

    def dl_of(doc: int) -> int:
        i = int(np.searchsorted(dl_lookup_ids, doc))
        return int(dl_vals[i])

    while True:
        live = [it for it in iters if not it.done]
        if not live:
            break
        live.sort(key=lambda it: it.cur)
        # pivot: first index where cumulative upper bounds could reach
        # theta (>= keeps exact-tie candidates alive for the doc_id
        # tie-break; strict > would prune a tying smaller doc_id)
        acc = 0.0
        pivot = -1
        for i, it in enumerate(live):
            acc += it.global_ub
            if len(heap) < k or acc >= theta:
                pivot = i
                break
        if pivot < 0:
            break  # even all terms together cannot reach theta
        pivot_doc = live[pivot].cur
        if live[0].cur == pivot_doc:
            # sorted order => every iter at/before the pivot sits exactly
            # on pivot_doc, so its current block spans pivot_doc and the
            # block-max refinement below is a valid bound
            if prune and len(heap) >= k:
                on_pivot = [it for it in live if it.cur == pivot_doc]
                bub = sum(it.block_ub() for it in on_pivot)
                if bub < theta:
                    # no doc in [pivot_doc, boundary] can reach theta from
                    # these terms alone; later terms' docs cap the skip so
                    # their combinations are never jumped over
                    boundary = min(it.block_last() for it in on_pivot) + 1
                    later = [it.cur for it in live if it.cur > pivot_doc]
                    target = max(min([boundary] + later), pivot_doc + 1)
                    for it in on_pivot:
                        it.next_geq(target)
                    continue
            dl = dl_of(pivot_doc)
            score = 0.0
            for it in live:
                if not it.done and it.cur == pivot_doc:
                    score += it.idf * _bm25_partial(float(it.cur_tf),
                                                    float(dl), k1, b, avgdl)
            for it in live:
                if not it.done and it.cur == pivot_doc:
                    it.advance()
            entry = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
            if len(heap) >= k:
                theta = heap[0][0]
        else:
            # align everything before the pivot up to pivot_doc
            for it in live[:pivot]:
                it.next_geq(pivot_doc)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-d, s) for s, d in out]


# --- build --------------------------------------------------------------------

def build_segments(spark, tokens: DataFrame, documents: DataFrame,
                   cfg: IndexConfig | None = None,
                   n_shards: int = 8) -> SegmentIndex:
    """tokens(doc_id, term, tf) + documents(doc_id, doc_len) ->
    SegmentIndex. One shuffle on (shard, term) builds sorted posting
    arrays JVM-side; an Arrow-batched mapInPandas pass encodes varbyte
    blocks + block-max metadata (numpy, no per-value Python)."""
    from textindexing_spark._pkg import ensure_shipped

    ensure_shipped(spark)
    cfg = cfg or IndexConfig()
    k1, b = cfg.bm25.k1, cfg.bm25.b
    row = documents.agg(F.count("*").alias("n"),
                        F.avg("doc_len").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
    block_size = cfg.block_size

    with_dl = (tokens.join(documents, "doc_id")
               .withColumn("shard",
                           F.pmod(F.col("doc_id"), F.lit(n_shards))
                            .cast("int")))
    grouped = (with_dl.groupBy("shard", "term")
               .agg(F.sort_array(F.collect_list(
                        F.struct("doc_id", "tf", "doc_len"))).alias("plist")))

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"shard": [], "term": [], "n_docs": [], "gaps": [],
                    "tfs": [], "blocks": []}
            for shard, term, plist in zip(pdf["shard"], pdf["term"],
                                          pdf["plist"]):
                docs = np.fromiter((p["doc_id"] for p in plist),
                                   dtype=np.int64, count=len(plist))
                tfs = np.fromiter((p["tf"] for p in plist),
                                  dtype=np.int64, count=len(plist))
                dls = np.fromiter((p["doc_len"] for p in plist),
                                  dtype=np.float64, count=len(plist))
                gb, tb, blocks = codec.encode_postings(docs, tfs, block_size)
                partial = _bm25_partial(tfs.astype(np.float64), dls,
                                        k1, b, avgdl)
                for i, bl in enumerate(blocks):
                    s, e = i * block_size, i * block_size + bl["n"]
                    bl["max_score"] = float(partial[s:e].max())
                rows["shard"].append(shard)
                rows["term"].append(term)
                rows["n_docs"].append(len(plist))
                rows["gaps"].append(gb)
                rows["tfs"].append(tb)
                rows["blocks"].append(blocks)
            yield pd.DataFrame(rows)

    segments = grouped.mapInPandas(encode, SEGMENT_SCHEMA)

    def encode_docs(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"shard": [], "doc_ids": [], "doc_lens": [], "n": []}
            for shard, plist in zip(pdf["shard"], pdf["dlist"]):
                ids = np.fromiter((p["doc_id"] for p in plist),
                                  dtype=np.int64, count=len(plist))
                lens = np.fromiter((p["doc_len"] for p in plist),
                                   dtype=np.int64, count=len(plist))
                rows["shard"].append(shard)
                rows["doc_ids"].append(
                    codec.varbyte_encode(ids).tobytes())
                rows["doc_lens"].append(
                    codec.varbyte_encode(lens).tobytes())
                rows["n"].append(len(plist))
            yield pd.DataFrame(rows)

    shard_docs = (documents
                  .withColumn("shard",
                              F.pmod(F.col("doc_id"), F.lit(n_shards))
                               .cast("int"))
                  .groupBy("shard")
                  .agg(F.sort_array(F.collect_list(
                           F.struct("doc_id", "doc_len"))).alias("dlist"))
                  .mapInPandas(encode_docs, SHARD_DOCS_SCHEMA))

    term_stats = tokens.groupBy("term").agg(F.count("*").alias("df"))
    return SegmentIndex(spark, segments, shard_docs, term_stats,
                        n_docs, avgdl, cfg)


def segment_index_from(idx, n_shards: int = 8) -> SegmentIndex:
    """Build the ranked-retrieval segments from a (boolean) Index by
    exploding its postings — same tokens, no re-tokenization."""
    tokens = (idx.postings
              .select("term", F.explode("postings").alias("p"))
              .select(F.col("p.doc_id").alias("doc_id"), "term",
                      F.col("p.tf").alias("tf")))
    return build_segments(idx.spark, tokens, idx.documents, idx.cfg,
                          n_shards)
