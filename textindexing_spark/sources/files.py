"""Filesystem document sources — real files, not tables.

The reference's primary workflow points an Indexer at a DIRECTORY and a
glob: `DirectoryDocumentSource(path, "*.txt")` enumerates matching files
(S1 bulk scan, DirectoryDocumentSource.cs:69-76), `SingleFileDocumentSource`
serves one file (S2, SingleFileDocumentSource.cs:56-64), and a
FileSystemWatcher feeds changed files as a stream (S3,
DirectoryDocumentSource.cs:78-109). Decoding uses a configurable
`DefaultEncoding` behind a BOM-detecting StreamReader
(FileSystemDocumentSource.cs:23-53) and never fails the pipeline on a bad
file (P7 isolation via retry/ignore, FileSystemDocumentSource.cs:79-96).

Spark-first equivalents, each emitting the engine's canonical ``pages``
shape (sources/pages.PAGES_SCHEMA) so every downstream operator — bulk
build, streaming ingest, registry — composes unchanged:

- ``read_directory``  — batch: the `binaryFile` source. The glob compiles
  to `pathGlobFilter`, applied at file LISTING time (partition-pruning
  equivalent: non-matching files are never opened), and the raw bytes
  land in ``html`` with text decoded by a BOM-aware Arrow-batched pandas
  UDF (replacement-character semantics, exactly StreamReader's — a
  malformed file yields replacement chars, never a task failure).
- ``read_file``       — S2 point read: one file through the same path.
- ``stream_directory`` — S3: the Structured Streaming file source tails
  the directory for NEW files (the watcher twin; each micro-batch is the
  change set). Spark's streaming text source is UTF-8 — documented
  narrowing; non-UTF-8 corpora bulk-load via ``read_directory``.

100 TB shape: `binaryFile` listing is driver-parallelized and the decode
is a narrow per-partition map — no shuffle anywhere; partitioning follows
`spark.sql.files.maxPartitionBytes` over file sizes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

# BOMs the reference's StreamReader auto-detects regardless of the
# configured default encoding.
_BOMS = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)


def decode_bytes(bs: bytes | None, default_encoding: str = "utf-8") -> str | None:
    """Decode one file's bytes: BOM wins, else ``default_encoding``;
    undecodable bytes become U+FFFD (StreamReader semantics — a corrupt
    file degrades to replacement chars instead of failing the task)."""
    if bs is None:
        return None
    for bom, enc in _BOMS:
        if bs.startswith(bom):
            return bs[len(bom):].decode(enc, "replace")
    return bs.decode(default_encoding, "replace")


def _decode_udf(default_encoding: str):
    @pandas_udf("string")
    def dec(content: pd.Series) -> pd.Series:
        return content.map(lambda b: decode_bytes(b, default_encoding))

    return dec


def read_directory(spark: SparkSession, root: str, pattern: str = "*",
                   recursive: bool = True,
                   default_encoding: str = "utf-8") -> DataFrame:
    """S1 over a real directory: every file under ``root`` matching the
    ``*``/``?`` glob, as a pages-shaped DataFrame (url=path,
    warc_ts=mtime, html=raw bytes, text=decoded, lang=null). The glob
    validates like the reference's SearchPattern (SearchPattern.cs:63-67)
    and prunes at listing time via ``pathGlobFilter``."""
    from textindexing_spark.sources.glob import glob_to_regex

    glob_to_regex(pattern)  # validation only: reject '<>"|' chars loudly
    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", pattern)
           .option("recursiveFileLookup", "true" if recursive else "false")
           .load(root))
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        _decode_udf(default_encoding)(F.col("content")).alias("text"),
        F.lit(None).cast("string").alias("lang"))


def read_file(spark: SparkSession, path: str,
              default_encoding: str = "utf-8") -> DataFrame:
    """S2: one file as a one-row pages DataFrame (SingleFileDocumentSource
    twin). A missing file yields an empty DataFrame, not an error —
    matching OpenDocument's null return (FileSystemDocumentSource.cs:45)."""
    try:
        return read_directory(spark, path, pattern="*", recursive=False,
                              default_encoding=default_encoding)
    except Exception as e:  # AnalysisException: PATH_NOT_FOUND
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        from textindexing_spark.sources.pages import PAGES_SCHEMA

        return spark.createDataFrame([], PAGES_SCHEMA)


def stream_directory(spark: SparkSession, root: str, pattern: str = "*",
                     recursive: bool = True) -> DataFrame:
    """S3: the directory as a Structured Streaming source of NEW files
    (FileSystemWatcher twin — composes directly with
    streaming.ingest.StreamingIngestor, whose micro-batch upsert gives
    re-crawled/rewritten paths last-wins semantics). Each file is one
    row in the pages shape; ``warc_ts`` is the ingestion timestamp
    (the file-source queue is ordered by modification time). UTF-8 only
    (Spark streaming text source); ``html`` carries the UTF-8 bytes so
    the extract contract still round-trips."""
    raw = (spark.readStream.format("text")
           .option("wholetext", "true")
           .option("pathGlobFilter", pattern)
           .option("recursiveFileLookup", "true" if recursive else "false")
           .load(root))
    return raw.select(
        F.input_file_name().alias("url"),
        F.current_timestamp().alias("warc_ts"),
        F.encode(F.col("value"), "UTF-8").alias("html"),
        F.col("value").alias("text"),
        F.lit(None).cast("string").alias("lang"))
