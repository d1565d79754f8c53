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

- ``read_directory``  — batch: the `binaryFile` source, raw bytes in
  ``html``, text decoded by a BOM-aware Arrow-batched pandas UDF
  (replacement-character semantics, exactly StreamReader's — a malformed
  file yields replacement chars, never a task failure).
- ``list_directory``  — the same enumeration WITHOUT content (url,
  warc_ts, n_bytes): column pruning means no file body is read — the
  cheap input for fingerprints/reconciliation.
- ``read_file``       — S2 point read: one file through the same path.
- ``stream_directory`` — S3: the Structured Streaming file source tails
  the directory for NEW files (the watcher twin; each micro-batch is the
  change set). Streams the same ``binaryFile`` shape as the batch path,
  so BOM detection and the configurable default encoding are identical
  byte-for-byte between the bulk and watch phases (a cp1251 file indexes
  the same text either way).
- ``read_paths``      — an explicit file LIST through the batch decode
  path (the reconcile loops read exactly the changed files, not the
  whole directory).

Glob semantics are the ENGINE's (sources/glob.glob_to_regex — the
reference's SearchPattern contract: case-insensitive, only ``*``/``?``
are wild, everything else literal). Hadoop's ``pathGlobFilter`` differs
(``[ ] { }`` are metacharacters, matching is case-sensitive), so it is
used only as a listing-time PRUNING superset when the pattern is
expressible (letters become ``[xX]`` classes); the authoritative filter
is always the engine-semantics regex over the file name.

All sources normalize ``url`` to the ``file:///...`` form so a document
keeps ONE identity across the batch and stream paths (binaryFile emits
``file:/p``, input_file_name emits ``file:///p`` for the same file —
un-normalized they would double-index under UrlIdTable).

100 TB shape: listing is driver-parallelized and the decode is a narrow
per-partition map — no shuffle anywhere; partitioning follows
`spark.sql.files.maxPartitionBytes` over file sizes.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

# BOMs the reference's StreamReader auto-detects regardless of the
# configured default encoding. UTF-32 entries MUST precede UTF-16:
# the UTF-32LE BOM starts with the UTF-16LE one (prefix shadowing) —
# .NET checks UTF-32 first for the same reason.
_BOMS = (
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
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


def _norm_url(col):
    """Canonical file url: exactly three slashes after the scheme."""
    return F.regexp_replace(col, "^file:/+", "file:///")


def _prune_glob(pattern: str) -> str | None:
    """A case-insensitive Hadoop-glob SUPERSET of the engine glob, for
    listing-time pruning — or None when the pattern contains characters
    Hadoop treats as metacharacters (``[ ] { } \\``), in which case no
    pre-filter is applied and the post-filter alone decides."""
    out = []
    for ch in pattern:
        if ch in "*?":
            out.append(ch)
        elif ch.isascii() and ch.isalpha():
            out.append(f"[{ch.lower()}{ch.upper()}]")
        elif ch.isdigit() or ch in "_.- ":
            out.append(ch)
        else:
            return None
    return "".join(out)


def _glob_filter_basename(df: DataFrame, pattern: str) -> DataFrame:
    """The authoritative glob: engine/SearchPattern semantics over the
    file NAME (case-insensitive; only * and ? wild)."""
    from textindexing_spark.sources.glob import glob_to_regex

    rx = glob_to_regex(pattern)
    return df.where(
        F.element_at(F.split(F.col("url"), "/"), -1).rlike(rx))


def _listing_reader(spark: SparkSession, pattern: str, recursive: bool,
                    stream: bool = False):
    # ONE format for both phases: binaryFile is a regular FileFormat, so
    # readStream tails it like any file source — and the watch phase
    # then decodes through exactly the batch path's BOM/encoding UDF
    # (streaming sources require the schema stated up front)
    r = (spark.readStream if stream else spark.read).format("binaryFile")
    if stream:
        r = r.schema("path string, modificationTime timestamp, "
                     "length long, content binary")
    pre = _prune_glob(pattern)
    if pre is not None:
        r = r.option("pathGlobFilter", pre)
    return r.option("recursiveFileLookup",
                    "true" if recursive else "false")


def _pages_projection(raw: DataFrame, default_encoding: str) -> DataFrame:
    """binaryFile rows -> the canonical pages shape (shared by the
    batch, stream, and explicit-path readers)."""
    return raw.select(
        _norm_url(F.col("path")).alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        _decode_udf(default_encoding)(F.col("content")).alias("text"),
        F.lit(None).cast("string").alias("lang"))


def read_directory(spark: SparkSession, root: str, pattern: str = "*",
                   recursive: bool = True,
                   default_encoding: str = "utf-8") -> DataFrame:
    """S1 over a real directory: every file under ``root`` matching the
    ``*``/``?`` glob (SearchPattern semantics — see module docstring),
    as a pages-shaped DataFrame (url=normalized path, warc_ts=mtime,
    html=raw bytes, text=decoded, lang=null)."""
    raw = _listing_reader(spark, pattern, recursive).load(root)
    return _glob_filter_basename(
        _pages_projection(raw, default_encoding), pattern)


def read_paths(spark: SparkSession, paths: list[str],
               default_encoding: str = "utf-8") -> DataFrame:
    """An explicit list of file paths through the same binaryFile +
    BOM/encoding decode as ``read_directory`` — the reconcile loops
    re-read exactly the files whose fingerprint moved instead of
    rescanning the directory."""
    from textindexing_spark.sources.pages import PAGES_SCHEMA

    if not paths:
        return spark.createDataFrame([], PAGES_SCHEMA)
    # load() applies Hadoop glob interpretation to every path; these
    # are LITERAL file names from a listing diff, so escape the glob
    # metacharacters or a file like 'report[2024].txt' silently
    # matches nothing (and the reconcile caller would then record its
    # fingerprint as seen without ever re-indexing it)
    escaped = [re.sub(r"([*?\[\]{}\\])", r"\\\1", p) for p in paths]
    raw = spark.read.format("binaryFile").load(escaped)
    return _pages_projection(raw, default_encoding)


def list_directory(spark: SparkSession, root: str, pattern: str = "*",
                   recursive: bool = True,
                   with_hash: bool = False) -> DataFrame:
    """The directory ENUMERATION only — (url, warc_ts, n_bytes), no
    content column projected, so no file body is ever read (binaryFile
    prunes the ``content`` column). The cheap input for change
    fingerprints and delete reconciliation over a file corpus.

    ``with_hash=True`` adds a ``content_hash`` column (xxhash64 over the
    raw bytes, JVM-side) — the high-fidelity fingerprint that catches
    overwrites preserving both mtime and length. It reads every file's
    body, so a hashed listing costs O(corpus bytes) instead of
    O(listing); reserve it for watch loops whose writers rewrite files
    without touching metadata."""
    raw = _listing_reader(spark, pattern, recursive).load(root)
    cols = [
        _norm_url(F.col("path")).alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("length").alias("n_bytes")]
    if with_hash:
        cols.append(F.xxhash64(F.col("content")).alias("content_hash"))
    return _glob_filter_basename(raw.select(*cols), pattern)


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
                     recursive: bool = True,
                     default_encoding: str = "utf-8") -> DataFrame:
    """S3: the directory as a Structured Streaming source of NEW files
    (FileSystemWatcher twin — composes directly with
    streaming.ingest.StreamingIngestor, whose micro-batch upsert gives
    re-crawled paths last-wins semantics). Each file is one row in the
    pages shape, decoded through the SAME binaryFile + BOM/default-
    encoding path as ``read_directory`` — a cp1251 or UTF-16 file
    yields byte-identical text in the bulk and watch phases, and
    ``html`` carries the raw file bytes so the extract contract
    round-trips. Urls are normalized to the same ``file:///`` form
    ``read_directory`` emits, so a file keeps one UrlIdTable identity
    across phases.

    Limitation (Spark file source): files are keyed by PATH — an
    in-place overwrite of an already-seen path never re-emits. Pair a
    live watch with periodic ``StreamingIngestor.reconcile_directory``
    (mtime/length fingerprint reconcile ≙ the reference watcher's
    Changed events) to pick up in-place modifications and deletions."""
    raw = (_listing_reader(spark, pattern, recursive, stream=True)
           .load(root))
    return _glob_filter_basename(
        _pages_projection(raw, default_encoding), pattern)
