"""Field-weighted ranked retrieval: BM25F over per-field indexes
(title / body / anchor ... any set of fields sharing one doc_id space).

True BM25F (Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework: BM25 and Beyond", section 7): per-field term frequencies are
weight-combined BEFORE saturation —

    tf~(t,d)  = sum_f  w_f * tf_f(t,d)
    dl~(d)    = sum_f  w_f * dl_f(d)        (avgdl~ = corpus mean)
    score(d)  = sum_t idf(t) * tf~ / (tf~ + k1*(1 - b + b*dl~/avgdl~))

— which rewards a term appearing in a highly-weighted short field
(title) far more than a linear combination of per-field BM25 scores
would, and keeps ONE saturation curve per term (the known flaw of the
naive weighted-sum-of-BM25s is that each field saturates separately).
idf uses the engine's standard formula over df~ = |{d : tf~(t,d) > 0}|
(docs matching in ANY field).

The reference has no field concept (it indexes one text stream per
document); this is the web-ranking extension on top — the synthetic
pages' HTML carries a real <title> element (sources/pages.py:76) that
the BODY extractor deliberately drops, so title/body fields partition
the page's tokens.

Scale shape (the whole plan is Catalyst, no Python):

- each field contributes one PRUNED postings scan (pushed In-filter on
  the query terms) exploded to (term, doc_id, w*tf) — identical to
  ``Index.bm25_scores``'s candidate scan;
- ONE hash aggregation on (term, doc_id) merges the fields (the only
  data-sized shuffle; its input is bounded by the query terms' postings,
  never the corpus);
- dl~ is an aggregation of the per-field documents DIMENSIONS (doc_id,
  doc_len — 2 narrow columns), joined back on doc_id (AQE-broadcast for
  selective queries);
- df~/N/avgdl~ are a per-term count (broadcast) and two scalars;
- top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from textindexing_spark.operators.query import Index


def field_docs_from_pages(pages: DataFrame) -> dict[str, DataFrame]:
    """{'title': docs, 'body': docs} — per-field (doc_id, text) frames
    from a pages-shaped table (doc_id, html, text). The body field is
    the golden/extracted text; the title field extracts <title> from
    the raw html (one Arrow projection)."""
    from textindexing_spark.functions.extract import (
        extract_text_column, extract_title_udf)

    # body honors the repo's extraction contract: text==NULL + html
    # present => extract on the fly (a NULL body would silently drop
    # the doc from the body index)
    with_body = extract_text_column(pages)
    return {
        "title": pages.select(
            "doc_id", extract_title_udf()(F.col("html")).alias("text")),
        "body": with_body.select("doc_id", "text"),
    }


def bm25f_scores(fields: dict[str, tuple[Index, float]],
                 query_text: str,
                 corpus_stats: tuple[int, float] | None = None
                 ) -> DataFrame:
    """(doc_id, score) for every doc matching >= 1 query term in >= 1
    field. ``fields``: {name: (Index, weight)} — weights must be > 0
    (drop a field instead of zero-weighting it: a 0 weight would still
    inflate df~ with tf~=0 matches), and all indexes must share one
    doc_id space and one tokenizer/case/BM25-parameter configuration
    (validated; ``Index.load`` restores the persisted config so loaded
    snapshots carry their build-time settings).

    ``corpus_stats=(n_docs, avgdl~)``: pass the value a serving session
    computed once (see ``bm25f_corpus_stats``) to skip the per-call
    documents-dimension aggregation — the analogue of
    ``Index.corpus_stats`` memoization."""
    if not fields:
        raise ValueError("need at least one field")
    if any(w <= 0 for _, w in fields.values()):
        raise ValueError("field weights must be > 0 (drop the field "
                         "instead of zero-weighting it)")
    idxs = [ix for ix, _ in fields.values()]
    spark = idxs[0].spark
    cfg = idxs[0].cfg
    for ix in idxs[1:]:
        if (ix.cfg.tokenizer, ix.cfg.case_insensitive,
                ix.cfg.bm25.k1, ix.cfg.bm25.b) != (
                cfg.tokenizer, cfg.case_insensitive,
                cfg.bm25.k1, cfg.bm25.b):
            raise ValueError("field indexes disagree on tokenizer/case/"
                             "BM25 config — terms or scores would not "
                             "align")
    from textindexing_spark.functions.tokenize import tokenize_text

    terms = sorted(set(tokenize_text(query_text, cfg.tokenizer,
                                     cfg.case_insensitive)))
    out_schema = "doc_id bigint, score double"
    if not terms:
        return spark.createDataFrame([], out_schema)

    # per-field pruned candidate scans -> ONE (term, doc_id) merge agg
    parts = []
    for ix, w in fields.values():
        parts.append(
            ix.postings.where(F.col("term").isin(terms))
            .select("term", F.explode("postings").alias("p"))
            .select("term", F.col("p.doc_id").alias("doc_id"),
                    (F.col("p.tf").cast("double") * float(w))
                    .alias("wtf")))
    weighted = (reduce(DataFrame.unionByName, parts)
                .groupBy("term", "doc_id")
                .agg(F.sum("wtf").alias("tfw")))

    # dl~ over the union of the field documents dims (2-column frames);
    # a doc absent from a field contributes 0 to that field's term
    dl = _weighted_dl(fields)
    if corpus_stats is not None:
        n_docs, avgdl = int(corpus_stats[0]), float(corpus_stats[1])
    else:
        n_docs, avgdl = bm25f_corpus_stats(fields)
    if n_docs == 0:
        return spark.createDataFrame([], out_schema)

    # idf over df~ = docs matching in ANY field (vocabulary-bound dim)
    dfs = weighted.groupBy("term").agg(F.count("*").alias("dfw"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("dfw") + 0.5)
                / (F.col("dfw") + 0.5))
    k1, b = cfg.bm25.k1, cfg.bm25.b
    sat = (F.col("tfw") * (k1 + 1.0)) / (
        F.col("tfw") + k1 * (1.0 - b + b * F.col("dlw") / avgdl))
    # (k1+1) numerator: same convention as Index.bm25_scores — a
    # monotone per-term rescale, rank-neutral, keeps single-field
    # BM25F(w=1) numerically identical to bm25_scores
    return (weighted
            .join(F.broadcast(dfs), "term")
            .join(dl, "doc_id")
            .withColumn("w", idf * sat)
            .groupBy("doc_id").agg(F.sum("w").alias("score")))


def _weighted_dl(fields) -> DataFrame:
    dls = [ix.documents.select(
               "doc_id",
               (F.col("doc_len").cast("double") * float(w)).alias("wdl"))
           for ix, w in fields.values()]
    return (reduce(DataFrame.unionByName, dls)
            .groupBy("doc_id").agg(F.sum("wdl").alias("dlw")))


def bm25f_corpus_stats(fields: dict[str, tuple[Index, float]]
                       ) -> tuple[int, float]:
    """(n_docs, avgdl~) over the union of the field corpora — compute
    ONCE per serving session / weight setting and pass to
    ``bm25f_scores(corpus_stats=...)``."""
    row = _weighted_dl(fields).agg(
        F.count("*").alias("n"), F.avg("dlw").alias("avgdl")).collect()[0]
    return int(row["n"] or 0), float(row["avgdl"] or 0.0)


def search_bm25f(fields: dict[str, tuple[Index, float]],
                 query_text: str, k: int = 10,
                 corpus_stats: tuple[int, float] | None = None
                 ) -> DataFrame:
    """BM25F top-k: score desc, doc_id asc (TakeOrderedAndProject)."""
    return (bm25f_scores(fields, query_text, corpus_stats=corpus_stats)
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(int(k)))
