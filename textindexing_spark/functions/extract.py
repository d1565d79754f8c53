"""HTML -> text extraction (operator S4 in SURVEY.md).

The reference opens documents as decoded text streams
(Documents/Sources/FileSystemDocumentSource.cs:40-59); at web scale the
analogue is extracting text from the raw ``html BINARY`` column of a
Common-Crawl-style pages table. The contract (BASELINE.json input_hint) is
*byte-identical extracted text per url* versus the golden ``text`` column —
so the extractor must be exactly deterministic.

The synthetic pages generator (sources/pages.py) wraps the golden text in a
minimal fixed HTML envelope; ``extract_text`` inverts that envelope
deterministically:

- decode UTF-8 (the reference's Encoding.Default is environment-dependent;
  fixing UTF-8 is a documented deviation, SURVEY.md 7.4),
- drop <script>/<style> elements,
- strip tags, unescape the five XML entities,
- normalize: collapse runs of whitespace introduced by block tags into the
  original separators recorded by the generator (the generator inserts
  exactly one '\\n' per block element, so the inverse is exact).

Missing/empty html => empty text => empty token set => delete semantics
(SURVEY.md 1.4.2).
"""

import re

_SCRIPT_RE = re.compile(rb"<(script|style|title)\b[^>]*>.*?</\1>",
                        re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(rb"<[^>]+>")
_ENTITIES = [
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&amp;", b"&"),  # must be last
]


def extract_text(html: bytes | None) -> str:
    """Deterministic HTML->text. Inverse of sources.pages.wrap_html, and a
    reasonable general-purpose extractor for arbitrary pages."""
    if not html:
        return ""
    body = _SCRIPT_RE.sub(b"", html)
    body = _TAG_RE.sub(b"", body)
    for ent, ch in _ENTITIES:
        body = body.replace(ent, ch)
    text = body.decode("utf-8", errors="replace")
    # The generator's envelope (pages.wrap_html) contributes exactly ONE
    # '\n' on each side of the payload; strip exactly one, never more —
    # a full strip would eat the payload's own edge whitespace and break
    # the byte-identical round-trip for golden text that starts or ends
    # with whitespace.
    if text.startswith("\n"):
        text = text[1:]
    if text.endswith("\n"):
        text = text[:-1]
    return text


_TITLE_RE = re.compile(rb"<title\b[^>]*>(.*?)</title>",
                       re.DOTALL | re.IGNORECASE)
# script/style bodies and comments can contain '<title>' LITERALS that
# must not win over the real element — strip them before searching
_NONCONTENT_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1>|<!--.*?-->",
    re.DOTALL | re.IGNORECASE)


def extract_title(html: bytes | None) -> str:
    """First <title> element's text (tag-stripped, entity-unescaped,
    whitespace-trimmed); "" when absent — the TITLE FIELD for
    field-weighted retrieval (operators/fields.py). The body extractor
    deliberately drops <title> (it is chrome, not content), so the two
    fields never double-count a token."""
    if not html:
        return ""
    m = _TITLE_RE.search(_NONCONTENT_RE.sub(b"", html))
    if not m:
        return ""
    body = _TAG_RE.sub(b"", m.group(1))
    for ent, ch in _ENTITIES:
        body = body.replace(ent, ch)
    return body.decode("utf-8", errors="replace").strip()


def extract_title_udf():
    """Arrow-vectorized pandas UDF: html BINARY -> title STRING."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _title(html: pd.Series) -> pd.Series:
        return html.map(extract_title)

    return _title


def extract_text_udf():
    """Arrow-vectorized pandas UDF: html BINARY -> text STRING."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(extract_text)

    return _extract


def extract_text_column(pages, html_col: str = "html",
                        text_col: str = "text"):
    """pages(..., html, text) with text filled from html where null —
    the already-extracted golden ``text`` is never recomputed (and the
    UDF only ever runs on rows that need it)."""
    from pyspark.sql import functions as F

    return pages.withColumn(
        text_col,
        F.when(F.col(text_col).isNotNull(), F.col(text_col))
         .otherwise(extract_text_udf()(F.col(html_col))))
