from textindexing_spark.sources.pages import (
    PAGES_SCHEMA,
    generate_pages,
    pages_from_documents,
    load_documents,
    wrap_html,
)
from textindexing_spark.sources.glob import glob_to_regex, glob_filter

__all__ = [
    "PAGES_SCHEMA",
    "generate_pages",
    "pages_from_documents",
    "load_documents",
    "wrap_html",
    "glob_to_regex",
    "glob_filter",
]
