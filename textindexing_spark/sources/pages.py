"""Pages source — the engine's primary input table.

Authoritative shape (BASELINE.json input_hint):

    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Three ways to get one:

- ``generate_pages``       — deterministic seeded synthetic corpus (Zipfian
                             vocabulary, Unicode rows, re-crawled urls,
                             empty documents) per FIXTURES.md section 1. The
                             ``html`` column is a fixed envelope around
                             ``text`` so the extractor contract
                             (byte-identical text per url) is testable.
- ``pages_from_documents`` — adapts the driver's documents.parquet
                             (doc_id, text, lang, source, n_chars) to the
                             pages shape.
- a real Common-Crawl-style table read via spark.read (parquet/Iceberg).

Bulk scan ≙ operator S1 (DirectoryDocumentSource.FindAllDocuments,
reference Documents/Sources/DirectoryDocumentSource.cs:69-76); point scan of
one url ≙ S2 (SingleFileDocumentSource.cs:56-64).
"""

from __future__ import annotations

import datetime as _dt
import random

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_EPOCH = _dt.datetime(2024, 1, 1)

# Unicode content classes mirrored from the reference test corpus
# (tests/.../Content/Text.txt is Windows-1251 Russian, Hyperonim.txt is
# UTF-8-BOM Russian; SURVEY.md section 5.4).
_UNICODE_SENTENCES = [
    "Гиперо́ним слово с более широким значением",
    "Пример текста в кодировке Windows-1251 и UTF-8",
    "Schrœdinger and Schroedinger are distinct ordinal terms",
    "naïve café résumé — mixed-script test тест",
    "version 4.1.2 has tokens 4 1 2 and under_score splits",
]


def zipf_vocabulary(size: int = 5000) -> list[str]:
    """Deterministic vocabulary word{0..size-1} (the reference's synthetic
    generator shape, tests/.../Indexing/IndexTests.cs:225-238)."""
    return [f"word{i}" for i in range(size)]


def _zipf_sample(rng: random.Random, vocab: list[str], n: int) -> list[str]:
    # Inverse-CDF Zipf(s=1.07) over vocab ranks — heavy head exercises the
    # salting path at scale.
    out = []
    v = len(vocab)
    for _ in range(n):
        u = rng.random()
        # approximate Zipf via u^(-1/(s-1)) truncation-free power law
        rank = int(v * (u ** 3)) % v
        out.append(vocab[rank])
    return out


def wrap_html(text: str, title: str = "doc") -> bytes:
    """Fixed HTML envelope whose extraction (functions.extract.extract_text)
    reproduces ``text`` byte-identically."""
    esc = (
        text.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )
    return (
        f"<html><head><title>{title}</title>"
        f"<script>var x=1;</script><style>p{{}}</style></head>"
        f"<body>\n{esc}\n</body></html>"
    ).encode("utf-8")


def generate_pages_rows(
    n_docs: int = 1000,
    seed: int = 42,
    vocab_size: int = 5000,
    words_per_doc: int = 120,
    recrawl_fraction: float = 0.1,
    empty_fraction: float = 0.02,
) -> list[tuple]:
    """Deterministic list of pages rows (driver-free, picklable)."""
    rng = random.Random(seed)
    vocab = zipf_vocabulary(vocab_size)
    rows: list[tuple] = []
    for i in range(n_docs):
        url = f"https://example.org/doc/{i:06d}"
        ts = _EPOCH + _dt.timedelta(seconds=i * 37)
        if rng.random() < empty_fraction:
            text = ""
        else:
            words = _zipf_sample(rng, vocab, rng.randint(words_per_doc // 2,
                                                         words_per_doc))
            if rng.random() < 0.05:
                words.append(_UNICODE_SENTENCES[i % len(_UNICODE_SENTENCES)])
            text = " ".join(words)
        lang = "ru" if "кодировк" in text or "Гиперо" in text else "en"
        rows.append((url, ts, wrap_html(text, title=f"doc{i}"), text, lang))
    # Re-crawl batch: same urls, later warc_ts, 0%/50%/100% changed words
    # (re-merge patterns, reference IndexTests.cs:137-151).
    n_re = int(n_docs * recrawl_fraction)
    for j in range(n_re):
        i = rng.randrange(n_docs)
        url = f"https://example.org/doc/{i:06d}"
        ts = _EPOCH + _dt.timedelta(days=30, seconds=j * 53)
        mode = j % 3
        if mode == 0:
            text = rows[i][3]  # 0% changed
        elif mode == 1:
            old = rows[i][3].split()
            repl = _zipf_sample(rng, vocab, len(old) // 2)
            text = " ".join(old[: len(old) // 2] + repl)  # ~50% changed
        else:
            text = " ".join(_zipf_sample(rng, vocab, words_per_doc))  # 100%
        rows.append((url, ts, wrap_html(text, title=f"re{j}"), text,
                     rows[i][4]))
    return rows


def generate_pages(spark, **kwargs):
    """Synthetic pages DataFrame (deterministic; no external data)."""
    return spark.createDataFrame(generate_pages_rows(**kwargs), PAGES_SCHEMA)


def load_documents(spark, sf_dir: str):
    """Driver-provided documents table (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pages_from_documents(docs_df):
    """Adapt documents(doc_id, text, lang, source, n_chars) to the pages
    shape. url ≙ reference DocumentInfo.Id ("url for internet document",
    Documents/DocumentInfo.cs:33-39)."""
    from pyspark.sql import functions as F

    return docs_df.select(
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.lit(_EPOCH).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
