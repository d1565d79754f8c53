"""textindexing_spark — a PySpark-native full-text inverted-index engine.

A brand-new engine with the query and data-processing capabilities of the
reference library ``ilya-g/TextIndexing`` (an in-memory C# inverted index,
see /root/reference), re-designed for Spark's distributed execution model:

- tokenize -> postings -> query expressed as DataFrame lineages,
- posting lists built by a term-hash shuffle with explicit head-term salting,
- docID-delta + varbyte compression with block-max skip metadata,
- BM25 top-k with block-max pruning via mapInPandas + distributed top-k,
- snapshot-versioned parquet tables (MVCC) standing in for Iceberg,
- checkpoint-resumable stages with per-partition lineage manifests.

Public API (mirrors the reference surface, SURVEY.md section 7.5):

    from textindexing_spark import IndexConfig, build_index, Index
    idx = build_index(spark, pages_df, IndexConfig())
    idx.exact("cat")            # Q1  (ImmutableIndex.GetExactWord)
    idx.prefix("ca")            # Q2  (GetWordsStartWith)
    idx.words()                 # Q4  (GetIndexedWords)
    idx.search_bool("cat dog*") # B1-B6 boolean AND with wildcard routing
    idx.search_bm25("cat dog", k=10)  # ranked retrieval extension
"""

from textindexing_spark.config import IndexConfig
from textindexing_spark.operators.build import build_index, tokenize_documents
from textindexing_spark.operators.query import Index


def __getattr__(name):
    # lazy: the segment/bm25 module pulls in numpy — keep base import light
    if name in ("SegmentIndex", "build_segments_from_docs",
                "build_segments", "segment_index_from"):
        from textindexing_spark.operators import bm25

        return getattr(bm25, name)
    if name in ("search_bm25f", "bm25f_scores", "field_docs_from_pages"):
        from textindexing_spark.operators import fields

        return getattr(fields, name)
    if name in ("expand_synonyms", "parse_bool_expr", "unparse_bool_expr"):
        from textindexing_spark.operators import query

        return getattr(query, name)
    if name in ("normalize_docs", "normalize_query", "make_term_analyzer"):
        from textindexing_spark.functions import analyze

        return getattr(analyze, name)
    if name in ("hash_sample", "hash_split", "mixture_plan",
                "mixture_sample", "chunk_tokens", "pack_sequences"):
        from textindexing_spark.functions import sampling

        return getattr(sampling, name)
    if name == "cooccurrence":
        from textindexing_spark.functions import analysis

        return analysis.cooccurrence
    if name == "IvfVectorStore":
        from textindexing_spark.sources import vectorstore

        return vectorstore.IvfVectorStore
    raise AttributeError(name)


__all__ = ["IndexConfig", "build_index", "tokenize_documents", "Index",
           "SegmentIndex", "build_segments_from_docs", "build_segments",
           "segment_index_from", "search_bm25f", "bm25f_scores",
           "field_docs_from_pages", "expand_synonyms", "parse_bool_expr",
           "unparse_bool_expr", "normalize_docs", "normalize_query",
           "make_term_analyzer", "hash_sample", "hash_split",
           "mixture_plan", "mixture_sample", "chunk_tokens",
           "pack_sequences", "cooccurrence", "IvfVectorStore"]

__version__ = "0.1.0"
