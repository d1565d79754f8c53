"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All pure
Catalyst expressions (scale = partitioning only, no Python)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from textindexing_spark.operators.dedup import tokens_col

EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# GPT-2-ish pre-tokenizer shape: letter runs | single digits | other symbols
BPE_ISH_PATTERN = "[a-z]+|[0-9]|[^a-z0-9\\\\s]"


def _stop_ratio(ts_col: str = "ts"):
    in_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return F.expr(
        f"size(filter({ts_col}, t -> t IN ({in_list}))) / size({ts_col})")


def lang_id(docs: DataFrame, threshold: float = 0.03) -> DataFrame:
    """(doc_id, pred_lang) — n-gram/stopword heuristic: English iff the
    EN-stopword token ratio exceeds ``threshold``."""
    base = (docs.select("doc_id", tokens_col("text").alias("ts"))
            .where(F.size("ts") > 0))
    return base.select(
        "doc_id",
        F.when(_stop_ratio() > threshold, F.lit("en"))
         .otherwise(F.lit("unk")).alias("pred_lang"))


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, distinct_ratio, mean_token_len, stop_ratio,
    quality) — the length/punct/stopword-ratio family of filters."""
    base = (docs.select("doc_id", "text", tokens_col("text").alias("ts"))
            .where(F.size("ts") > 0))
    distinct_ratio = F.size(F.array_distinct("ts")) / F.size("ts")
    mean_len = F.expr(
        "aggregate(ts, CAST(0 AS DOUBLE), (acc, t) -> acc + length(t))"
    ) / F.size("ts")
    stop = _stop_ratio()
    return base.select(
        "doc_id",
        F.size("ts").alias("n_tokens"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop, 6).alias("stop_ratio"),
        F.round(distinct_ratio * 0.5 + (1.0 - stop) * 0.5, 6).alias("quality"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_word_tokens, n_bpe_ish) — whitespace split,
    word-char tokens, and a BPE-ish regex count. n_ws_tokens counts the
    MAXIMAL NON-WHITESPACE RUNS: split keeps leading/trailing empty
    strings and trim() strips only ASCII spaces, so a bare trim+size
    would report 2 tokens for '\\n\\n' and inflate every
    newline-terminated document by one."""
    ws = F.size(F.filter(F.split(F.col("text"), "\\s+"),
                         lambda t: t != F.lit("")))
    return docs.select(
        "doc_id",
        ws.cast("int").alias("n_ws_tokens"),
        F.size(tokens_col("text")).alias("n_word_tokens"),
        F.size(F.expr(
            f"regexp_extract_all(lower(text), '{BPE_ISH_PATTERN}', 0)"))
         .alias("n_bpe_ish"),
    )


ROLL_B = 131
ROLL_M = 1_000_000_007


def _roll_hash_col():
    """Order-SENSITIVE polynomial rolling hash (Rabin-Karp style) over
    the ``ts`` token array: h = fold(ts, (acc, t) -> (acc*B + H(t)) mod
    M) with H(t) from the token's md5 prefix. One definition shared by
    rolling_fingerprint and fingerprints()."""
    h = "conv(substring(md5(t), 1, 8), 16, 10)"
    return F.expr(
        f"aggregate(ts, CAST(0 AS BIGINT), (acc, t) -> "
        f"(acc * {ROLL_B} + CAST({h} AS BIGINT) % {ROLL_M}) "
        f"% {ROLL_M})")


def _doc_fingerprint_col():
    """md5 over the sorted distinct token set of the ``ts`` array —
    shared by doc_fingerprint and fingerprints()."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct("ts")), " "))


def rolling_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, roll_hash) — order-sensitive sequence fingerprint.
    Unlike doc_fingerprint (bag-of-words identity), this detects exact
    sequence duplicates and is engine-portable (same md5/modular
    arithmetic in any SQL dialect). Pure Catalyst fold — no Python."""
    return (docs.select("doc_id", tokens_col("text").alias("ts"))
            .where(F.size("ts") > 0)
            .select("doc_id", _roll_hash_col().alias("roll_hash")))


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — md5 over the sorted distinct token set: a
    canonical content fingerprint invariant to token order (bag-of-words
    identity), the groupable key for fuzzy-then-exact dedup."""
    return (docs.select("doc_id", tokens_col("text").alias("ts"))
            .where(F.size("ts") > 0)
            .select("doc_id",
                    _doc_fingerprint_col().alias("fingerprint")))


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint, roll_hash) — both document fingerprints
    (order-invariant bag-of-words md5 + order-sensitive rolling hash)
    from ONE tokenize pass: a single projection over the shared token
    array, where joining doc_fingerprint with rolling_fingerprint would
    tokenize the corpus twice and shuffle for the join."""
    return (docs.select("doc_id", tokens_col("text").alias("ts"))
            .where(F.size("ts") > 0)
            .select("doc_id",
                    _doc_fingerprint_col().alias("fingerprint"),
                    _roll_hash_col().alias("roll_hash")))


def _gram_expr(n: int):
    """ARRAY<STRING> of space-joined word n-grams over the ``ts`` token
    array — the one definition ngram_counts and ngram_contamination
    share."""
    return F.expr(
        f"transform(sequence(1, size(ts) - {n} + 1), "
        f"i -> concat_ws(' ', slice(ts, i, {n})))")


def ngram_counts(docs: DataFrame, n: int = 3,
                 min_count: int = 1) -> DataFrame:
    """(ngram, count) over the whole corpus — the LM-training /
    contamination-check primitive (count every word n-gram; join a
    test-set's n-grams against it to detect leakage).

    Pure Catalyst: token n-grams materialize JVM-side via
    transform(sequence(...)) over the token array — no Python, no
    per-token rows until the single explode — and the count aggregation
    is map-side combinable, so the one shuffle carries only partial
    (ngram, count) pairs. At 100 TB this is the canonical word-count
    shape: scale = partitioning, skew bounded by n-gram frequency
    (far flatter than unigram frequency for n >= 2)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    base = (docs.select(tokens_col("text").alias("ts"))
            .where(F.size("ts") >= n))
    grams = base.select(F.explode(_gram_expr(n)).alias("ngram"))
    out = (grams.groupBy("ngram")
           .agg(F.count("*").cast("bigint").alias("count")))
    if min_count > 1:
        out = out.where(F.col("count") >= min_count)
    return out


def ngram_contamination(corpus: DataFrame, probes: DataFrame,
                        n: int = 8) -> DataFrame:
    """(probe_id, n_grams, n_contaminated, contamination) — per probe
    document, the fraction of its distinct word n-grams that occur
    ANYWHERE in the corpus: the GPT-3-style n-gram decontamination
    check run before training (probes = eval/test documents).

    Scale shape: the corpus side reduces to DISTINCT n-grams (map-side
    combinable), probes explode to (probe_id, ngram) — tiny relative to
    the corpus — and one left-semi join marks contaminated grams before
    a per-probe aggregation. No corpus row ever joins more than its
    n-gram set; skew is bounded by n-gram frequency (flat for n >= 2)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    corpus_grams = (corpus.select(tokens_col("text").alias("ts"))
                    .where(F.size("ts") >= n)
                    .select(F.explode(_gram_expr(n)).alias("ngram"))
                    .distinct())
    probe_grams = (probes
                   .select(F.col("doc_id").alias("probe_id"),
                           tokens_col("text").alias("ts"))
                   .where(F.size("ts") >= n)
                   .select("probe_id",
                           F.explode(_gram_expr(n)).alias("ngram"))
                   .distinct())
    hits = (probe_grams
            .join(corpus_grams, "ngram", "left_semi")
            .groupBy("probe_id")
            .agg(F.count("*").alias("n_contaminated")))
    totals = (probe_grams.groupBy("probe_id")
              .agg(F.count("*").alias("n_grams")))
    # EVERY probe appears in the report: a probe too short to form one
    # n-gram gets n_grams=0 / contamination NULL, never a silently
    # missing row ("absent from the report" must not read as "clean")
    return (probes.select(F.col("doc_id").alias("probe_id")).distinct()
            .join(totals, "probe_id", "left")
            .join(hits, "probe_id", "left")
            .select("probe_id",
                    F.coalesce("n_grams", F.lit(0)).cast("bigint")
                     .alias("n_grams"),
                    F.coalesce("n_contaminated", F.lit(0)).cast("bigint")
                     .alias("n_contaminated"))
            .withColumn("contamination",
                        F.when(F.col("n_grams") > 0,
                               F.round(F.col("n_contaminated") /
                                       F.col("n_grams"), 6))))


def snippets(docs: DataFrame, term: str, width: int = 30) -> DataFrame:
    """(doc_id, pos, snippet) — result-presentation snippets: for every
    document containing ``term`` (case-folded), the 1-based character
    position of its first occurrence and a ±``width``-char context
    window around it. Pure per-row Catalyst (locate + substring) over
    the matching docs only, so the cost is the filtered scan — at serve
    time this composes with exact()/search_bm25 output to render hits.
    (Beyond the reference: its example app shows bare doc lists,
    IndexerViewModel.cs; snippets are the standard serving addition.)"""
    t = term.lower()
    pos = F.locate(t, F.lower(F.col("text")))
    start = F.greatest(F.col("pos") - width, F.lit(1))
    return (docs.select("doc_id", "text", pos.alias("pos"))
            .where(F.col("pos") > 0)
            .select("doc_id", "pos",
                    F.col("text").substr(
                        start, F.lit(2 * width + len(t))).alias("snippet")))


def domain_stats(pages: DataFrame) -> DataFrame:
    """(host, n_docs, total_chars, n_langs) — per-domain corpus rollup
    over a pages-shaped table (url, ..., text, lang): crawl-curation's
    first question ("which hosts dominate, in what language?"). Host
    extraction is one dialect-portable regexp over the url (scheme
    agnostic); the rollup is a single map-side-combinable aggregation,
    so at 100 TB the cost is the scan plus one shuffle of per-host
    partials. Skew note: a mega-host concentrates its partials on one
    reducer, but partials are already combined map-side so the reducer
    receives O(#map tasks) rows per host, not O(docs)."""
    host = F.regexp_extract("url", "^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    return (pages
            .select(host.alias("host"), F.length("text").alias("nc"),
                    "lang")
            .groupBy("host")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("nc").cast("bigint").alias("total_chars"),
                 F.countDistinct("lang").cast("bigint").alias("n_langs")))


def keywords(docs: DataFrame, k: int = 5,
             n_docs: int | None = None) -> DataFrame:
    """(doc_id, term, tf, tfidf, rank) — top-k TF-IDF keywords per
    document (corpus characterization / tag extraction). One tokenize
    pass: tf from the per-doc token bag; df AND the corpus size N both
    derive from that same tf frame (N = countDistinct(doc_id), a 1-row
    broadcast joined in — NO eager job, NO second corpus scan; pass
    ``n_docs`` to pin N from precomputed stats instead). idf =
    ln((N+1)/(df+1)) + 1 (smoothed, always positive), rank by tfidf
    desc with term-asc tie-break (deterministic). 100 TB shape: one
    explode + two hash aggregations + a per-doc top-k window over
    <=|vocab_doc| rows — the df side is a broadcast-sized dimension
    (vocabulary-bound)."""
    from pyspark.sql import Window

    tf = (docs.select("doc_id", tokens_col("text").alias("ts"))
          .where(F.size("ts") > 0)
          .select("doc_id", F.explode("ts").alias("term"))
          .groupBy("doc_id", "term")
          .agg(F.count("*").alias("tf")))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    if n_docs is not None:
        nd = F.lit(float(n_docs))
        dim = F.broadcast(df)
    else:
        nd = F.col("n_docs").cast("double")
        dim = F.broadcast(df.crossJoin(
            tf.select(F.countDistinct("doc_id").alias("n_docs"))))
    idf = F.log((nd + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0)
    scored = (tf.join(dim, "term")
              .withColumn("tfidf", F.round(F.col("tf") * idf, 6))
              .drop("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("doc_id", "term", "tf", "tfidf", "rank"))


def cooccurrence(docs: DataFrame, vocab: list[str] | None = None,
                 min_pair_count: int = 2,
                 max_terms_per_doc: int = 256) -> DataFrame:
    """(term_a, term_b, n_both, n_a, n_b, pmi) — document-level term
    co-occurrence with pointwise mutual information, term_a < term_b:
    n_both = documents containing both terms, n_a/n_b = each term's
    document frequency (within the same restriction), pmi =
    ln(n_both * N / (n_a * n_b)) over N qualifying documents. The
    corpus-statistics primitive behind synonym/related-term mining —
    high-PMI pairs feed ``expand_synonyms`` tables.

    Scale shape: pair generation NEVER self-joins the corpus — each
    document's sorted distinct (in-vocab) term array emits its own
    upper-triangle pairs via a nested JVM-side transform, then ONE
    map-side-combinable count aggregation (the word-count shape); the
    unigram dims and the 1-row N join back as broadcasts. The m² per-doc
    fan-out is bounded by ``vocab`` (pass one at web scale — e.g. the
    dictionary's mid-df band; a vocab no larger than
    ``max_terms_per_doc`` guarantees NO truncation) or, without a
    vocab, by ``max_terms_per_doc``: a document's pairs come from its
    first ``max_terms_per_doc`` distinct terms in sorted order
    (documented truncation — acceptable for mining, not for exact
    counts over unbounded vocabularies)."""
    if vocab is not None and not vocab:
        raise ValueError("vocab must be None or non-empty")
    ts = F.array_sort(F.array_distinct(tokens_col("text")))
    if vocab is not None:
        ts = F.array_intersect(ts, F.lit(sorted(set(vocab))))
    # ts is already sorted (array_sort above; array_intersect keeps
    # the first array's order), so slice directly — no second sort
    terms = (docs
             .select(F.col("doc_id"),
                     F.slice(ts, 1, int(max_terms_per_doc)).alias("t"))
             .where(F.size("t") > 0))
    pairs = terms.select(F.explode(F.expr(
        "flatten(transform(t, (x, i) -> "
        "transform(slice(t, i + 2, size(t)), "
        "y -> struct(x AS a, y AS b))))")).alias("p"))
    both = (pairs.groupBy(F.col("p.a").alias("term_a"),
                          F.col("p.b").alias("term_b"))
            .agg(F.count("*").alias("n_both"))
            .where(F.col("n_both") >= int(min_pair_count)))
    uni = (terms.select("doc_id", F.explode("t").alias("term"))
           .groupBy("term").agg(F.count("*").alias("n")))
    nd = terms.agg(F.count("*").alias("n_docs"))
    out = (both
           .join(F.broadcast(uni.withColumnRenamed("term", "term_a")
                             .withColumnRenamed("n", "n_a")), "term_a")
           .join(F.broadcast(uni.withColumnRenamed("term", "term_b")
                             .withColumnRenamed("n", "n_b")), "term_b")
           .crossJoin(F.broadcast(nd)))
    pmi = F.log(F.col("n_both").cast("double") *
                F.col("n_docs").cast("double") /
                (F.col("n_a").cast("double") *
                 F.col("n_b").cast("double")))
    return out.select("term_a", "term_b", "n_both", "n_a", "n_b",
                      pmi.alias("pmi"))
