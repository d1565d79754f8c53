"""Repetition / PII quality signals for training-data curation.

The Gopher-rules family (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", appendix A1.1):
documents dominated by repeated lines or repeated n-grams, or with
degenerate symbol-to-word ratios, are filtered before LM training.
This module computes those signals per document, Spark-first:

- line statistics and the symbol ratio are per-row Catalyst expressions
  (no shuffle at all);
- n-gram repetition explodes the 2- and 3-gram streams ONCE (tagged by
  n) into a map-side-combinable double aggregation — the canonical
  word-count shape, scale = partitioning;
- the final assembly is one join of two per-doc_id frames (both already
  hash-partitioned by the agg), so the whole operator costs two
  shuffles of per-doc scalar rows regardless of document size.

PII detection is pure `regexp_extract_all` / `regexp_replace` over
dialect-portable patterns (no lookarounds, no backreferences — the same
pattern text runs under Java regex and RE2), so the scan stays inside
whole-stage codegen and the redaction is reproducible in any engine.

Reference parity: the reference has no quality layer (it indexes
everything, TextIndexing.sln); these operators are the training-data
extensions the task brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from textindexing_spark.operators.dedup import tokens_col

# Dialect-portable PII patterns: character classes + bounded repetition
# only, valid and identical under Java regex (Spark) and RE2 (DuckDB).
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_PATTERN = ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}")
PHONE_PATTERN = "\\+[0-9]{7,12}|[0-9]{3}-[0-9]{3}-[0-9]{4}"


def _line_stats(docs: DataFrame) -> DataFrame:
    """Per-row (no shuffle) line + symbol signals."""
    lines = F.expr("filter(split(text, '\\n'), l -> length(trim(l)) > 0)")
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.round(1.0 - F.size(F.array_distinct(lines)) / n_lines, 6)
    ).otherwise(F.lit(0.0))
    n_tokens = F.size(tokens_col("text"))
    # symbols = anything outside letters/digits/whitespace
    n_symbols = F.length(F.regexp_replace(
        "text", "[\\p{L}\\p{Nd}\\s]", ""))
    symbol_ratio = F.round(
        n_symbols / F.greatest(n_tokens.cast("double"), F.lit(1.0)), 6)
    return docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        n_tokens.alias("n_tokens"),
        symbol_ratio.alias("symbol_ratio"),
    )


def _gram_stream(docs: DataFrame, ns: tuple[int, ...]) -> DataFrame:
    """(doc_id, n, gram) — the tagged union of each doc's n-gram streams
    for every n in ``ns``, from ONE tokenize pass and ONE explode (the
    per-n arrays concatenate per-row before exploding, so adding an n
    widens rows, not stages)."""
    gram_arrays = []
    for n in ns:
        # CASE guard: Spark's sequence(1, stop) counts DOWN when
        # stop < 1, which would feed slice() a zero start
        gram_arrays.append(F.expr(
            f"CASE WHEN size(ts) >= {n} THEN "
            f"transform(sequence(1, size(ts) - {n - 1}), "
            f"i -> struct({n} AS n, concat_ws(' ', slice(ts, i, {n})) "
            f"AS gram)) ELSE "
            f"CAST(array() AS ARRAY<STRUCT<n: INT, gram: STRING>>) END"))
    return (docs.select("doc_id", tokens_col("text").alias("ts"))
            .where(F.size("ts") > 0)
            .select("doc_id",
                    F.explode(F.concat(*gram_arrays)).alias("g"))
            .select("doc_id", F.col("g.n").alias("n"),
                    F.col("g.gram").alias("gram")))


def repetition_signals(docs: DataFrame, top_n: int = 2,
                       dup_n: int = 3) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, n_tokens, symbol_ratio,
    top_{top_n}gram_frac, dup_{dup_n}gram_frac) — the Gopher-style
    repetition filters:

    - ``dup_line_frac``: fraction of non-blank lines that are repeats of
      an earlier line (1 - distinct/total);
    - ``top_ngram_frac``: tokens attributed to the single most frequent
      ``top_n``-gram as a fraction of the doc's tokens
      (most_frequent_count * n / n_tokens, capped at 1.0 — overlapping
      occurrences double-count the shared tokens, so the uncapped value
      is an upper bound on true coverage) — boilerplate detector;
    - ``dup_ngram_frac``: fraction of ``dup_n``-gram occurrences whose
      gram occurs more than once — degenerate-loop detector;
    - ``symbol_ratio``: non-letter/digit/whitespace chars per token.

    Column names are fixed (``top_2gram_frac`` / ``dup_3gram_frac``
    style) so downstream filters are stable across parameter choices.
    100 TB shape: one explode + two hash aggregations (both map-side
    combinable) + one per-doc join; no stage's work grows faster than
    the token stream."""
    if top_n < 1 or dup_n < 1:
        raise ValueError("n-gram sizes must be >= 1")
    # NULL text behaves exactly like empty text (all-zero signals):
    # without this, split/size null-propagate and a NULL-text doc gets
    # NULL in every column — silently vanishing from BOTH sides of any
    # threshold filter.
    docs = docs.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    # equal sizes share ONE tagged stream (a duplicated tag would
    # double every count)
    ns = (top_n, dup_n) if top_n != dup_n else (top_n,)
    grams = _gram_stream(docs, ns)
    per_gram = grams.groupBy("doc_id", "n", "gram").agg(
        F.count("*").alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == top_n, F.col("c"))).alias("top_c"),
        F.sum(F.when(F.col("n") == dup_n, F.col("c"))).alias("dup_total"),
        F.sum(F.when((F.col("n") == dup_n) & (F.col("c") > 1),
                     F.col("c"))).alias("dup_rep"),
    )
    out = (_line_stats(docs)
           .join(per_doc, "doc_id", "left"))
    top_frac = F.when(
        F.col("n_tokens") >= top_n,
        # least(1.0): overlapping repeats ("ok ok ok" -> 2 * 2 / 3)
        # double-count shared tokens; the signal is a [0, 1] fraction
        F.round(F.least(F.col("top_c") * top_n / F.col("n_tokens"),
                        F.lit(1.0)), 6)
    ).otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.coalesce(F.col("dup_total"), F.lit(0)) > 0,
        F.round(F.coalesce(F.col("dup_rep"), F.lit(0)) /
                F.col("dup_total"), 6)
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id", "n_lines", "dup_line_frac", "n_tokens", "symbol_ratio",
        top_frac.alias(f"top_{top_n}gram_frac"),
        dup_frac.alias(f"dup_{dup_n}gram_frac"),
    )


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, redacted_hash) — count PII
    spans per document and fingerprint the redacted text (emails ->
    <EMAIL>, IPv4 -> <IP>, phone-shaped numbers -> <PHONE>, applied in
    that order). Counting and redaction share the one text pass; all
    patterns are dialect-portable (see module docstring), so any SQL
    engine reproduces both the counts and the redacted md5 exactly.

    Returning a hash instead of the redacted text keeps the row narrow;
    ``redact_pii`` below returns the full column for pipeline use."""
    # Column-API regexp_extract_all (NOT F.expr): pattern strings reach
    # the JVM verbatim, with no SQL-string-literal escaping layer
    def _n(pat, name):
        return F.size(F.regexp_extract_all(
            F.col(text_col), F.lit(pat), F.lit(0))).alias(name)

    return docs.select(
        F.col("doc_id"),
        _n(EMAIL_PATTERN, "n_emails"),
        _n(IPV4_PATTERN, "n_ipv4"),
        _n(PHONE_PATTERN, "n_phones"),
        F.md5(_redact_col(text_col)).alias("redacted_hash"),
    )


def _redact_col(text_col: str):
    r = F.regexp_replace(text_col, EMAIL_PATTERN, "<EMAIL>")
    r = F.regexp_replace(r, IPV4_PATTERN, "<IP>")
    return F.regexp_replace(r, PHONE_PATTERN, "<PHONE>")


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All input columns with ``text_col`` replaced by its redacted
    form — the in-pipeline scrubber (per-row, zero shuffle)."""
    return docs.withColumn(text_col, _redact_col(text_col))


def curate(docs: DataFrame, *, min_tokens: int = 10,
           max_dup_line_frac: float = 0.30,
           max_top_2gram_frac: float = 0.20,
           max_dup_3gram_frac: float = 0.30,
           max_symbol_ratio: float = 0.50,
           dedup_threshold: float = 0.5,
           strip_boilerplate: int | None = None,
           redact: bool = True) -> DataFrame:
    """The composed training-data curation pipeline: [optional
    exact-substring boilerplate strip ->] Gopher-rule repetition/length
    filters -> near-duplicate GROUP dedup (LSH candidates ->
    exact-Jaccard verify -> connected components, keep the min-id
    representative of each cluster) -> PII redaction. Returns the
    surviving documents with all original columns (``text`` redacted
    when ``redact``).

    ``strip_boilerplate=k`` removes corpus-wide repeated k-gram spans
    (``operators.dedup.strip_repeated_spans``) early — shared
    headers/footers otherwise both pollute the quality signals and glue
    unrelated pages together in the near-dup graph. Span-carrying docs
    are rebuilt token-level, so when the strip is on, PII redaction
    runs BEFORE it (the redaction regexes need the real @ . -
    characters); docs without spans keep their original text and every
    signal untouched. Caveat: a span-carrying doc's line/symbol signals
    are computed over its normalized form (such docs are
    boilerplate-heavy by definition — the population the strip exists
    for).

    Order matters and is deliberate: redaction (a per-row projection)
    and the boilerplate strip rewrite text first, quality filters run
    next (they are per-doc and shrink the corpus before pairwise work),
    and dedup runs on survivors only. Every stage is the scale-safe
    variant — no all-pairs joins, no driver-side loops beyond the
    cluster fixpoint counters."""
    from textindexing_spark.operators.dedup import (
        duplicate_clusters, near_duplicates, strip_repeated_spans)

    redact_last = redact
    if strip_boilerplate is not None:
        if redact:
            docs = redact_pii(docs)
            redact_last = False
        docs = strip_repeated_spans(docs, k=int(strip_boilerplate))
    sig = repetition_signals(docs)
    keep = (sig.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_2gram_frac") <= max_top_2gram_frac)
        & (F.col("dup_3gram_frac") <= max_dup_3gram_frac)
        & (F.col("symbol_ratio") <= max_symbol_ratio))
        .select("doc_id"))
    filtered = docs.join(keep, "doc_id", "left_semi")
    clusters = duplicate_clusters(
        near_duplicates(filtered, threshold=dedup_threshold))
    losers = (clusters.where(F.col("doc_id") != F.col("cluster"))
              .select("doc_id"))
    survivors = filtered.join(losers, "doc_id", "left_anti")
    return redact_pii(survivors) if redact_last else survivors
