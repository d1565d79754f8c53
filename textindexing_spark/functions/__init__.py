from textindexing_spark.functions.tokenize import (
    get_tokenizer,
    tokenize_text,
    tokenize_with_tf,
    SQL_TOKEN_PATTERN,
)
from textindexing_spark.functions.extract import extract_text, extract_text_udf

__all__ = [
    "get_tokenizer",
    "tokenize_text",
    "tokenize_with_tf",
    "SQL_TOKEN_PATTERN",
    "extract_text",
    "extract_text_udf",
]
