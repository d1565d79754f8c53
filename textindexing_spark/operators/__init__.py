from textindexing_spark.operators.build import build_index, tokenize_documents
from textindexing_spark.operators.phrase import (PositionalIndex,
                                                 PositionalSegmentIndex)
from textindexing_spark.operators.query import Index

__all__ = ["build_index", "tokenize_documents", "Index",
           "PositionalIndex", "PositionalSegmentIndex"]
