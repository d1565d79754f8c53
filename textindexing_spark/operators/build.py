"""Bulk index construction — operator A1 (bulk path) + A2 (SURVEY.md 2.3).

The reference merges one document at a time into a sorted dictionary under a
write lock (ImmutableIndex.cs:98-180, merge-join loop :130-176). The
distributed equivalent is a single declarative lineage:

    docs -> tokenize (Arrow-batched mapInPandas) -> (doc_id, term, tf)
         -> [df pre-pass for head-term salting]
         -> groupBy(term [, salt]).agg(sort_array(collect_list(...)))
         -> [salt merge pass] -> postings table

Spark's partial (map-side) + final hash aggregation does what the
reference's micro-batched merge loop does, minus the lock. Head-term skew
(stopwords at web scale) is handled EXPLICITLY: a cheap map-combinable
document-frequency pre-pass finds terms above ``salt_df_threshold``; their
rows get a ``pmod(doc_id, fanout)`` salt so no single reducer ever
materializes a stopword's full posting list in one task; a second, much
smaller shuffle merges the salted sublists.

Set semantics per document (duplicate words collapse, Indexer.cs:252-258)
hold because tokenize emits one row per DISTINCT term per doc with its tf.
Documents whose token set is empty do not enter the index and do not count
toward N (empty merge deletes, ImmutableIndex.cs:118-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from textindexing_spark.config import IndexConfig
from textindexing_spark.functions.tokenize import tokenize_series

TOKENS_SCHEMA = "doc_id bigint, term string, tf int"


def _count_tf(ids, tok_lists, np, pd):
    """Vectorized per-doc term-frequency counting for one Arrow batch —
    no per-doc/per-token Python dict loops in the hot encode stage.
    Factorize the batch's flat token stream once, combine (positional
    doc index, term code) into ONE int64 key, then count keys: a dense
    bincount when the key space is small (the common web-text batch —
    measured 20x faster than a lexsort on this box), else a single
    int64 sort + run-length pass. Empty docs contribute nothing (never
    indexed, SURVEY 1.4.2). Returns (doc_id, term, tf) arrays ordered
    by (batch position, term code)."""
    lens, total, kv, tf, uniq = _count_pairs(tok_lists, np, pd)
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64))
    V = len(uniq)
    return (ids[kv // V], np.asarray(uniq, dtype=object)[kv % V], tf)


def _count_pairs(tok_lists, np, pd):
    """Shared core of the batch tf counters: returns (lens, total,
    unique (pos*V+code) keys, counts, local vocabulary)."""
    from itertools import chain

    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    total = int(lens.sum())
    if total == 0:
        return lens, 0, None, None, None
    flat = np.fromiter(chain.from_iterable(tok_lists), dtype=object,
                       count=total)
    codes, uniq = pd.factorize(flat)
    codes = codes.astype(np.int64, copy=False)
    V = len(uniq)
    pos = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
    key = pos * V + codes
    key_space = int(lens.size) * V
    if key_space <= max(4 * total, 1 << 22):
        counts = np.bincount(key, minlength=key_space)
        kv = np.flatnonzero(counts)
        tf = counts[kv]
    else:
        key.sort()
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        tf = np.diff(np.append(starts, key.size))
        kv = key[starts]
    return lens, total, kv, tf, uniq


def tokenize_documents(docs: DataFrame, cfg: IndexConfig | None = None,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """docs(doc_id, text, ...) -> tokens(doc_id, term, tf).

    One Arrow-batched mapInPandas pass; the per-document dedup-with-count
    (≙ P6, the reference's SortedSet aggregation, Indexer.cs:248-258)
    happens inside the batch, so the shuffle input is already per-doc-unique
    (a free map-side dedup).
    """
    from textindexing_spark._pkg import ensure_shipped

    ensure_shipped(docs.sparkSession)
    cfg = cfg or IndexConfig()
    tokenizer = cfg.tokenizer
    fold = cfg.case_insensitive

    def _tok(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            tok_lists = tokenize_series(pdf[text_col], tokenizer, fold)
            doc_id, term, tf = _count_tf(pdf[id_col].to_numpy(np.int64),
                                         tok_lists, np, pd)
            yield pd.DataFrame(
                {"doc_id": pd.Series(doc_id, dtype="int64"),
                 "term": pd.Series(term, dtype="object"),
                 "tf": pd.Series(tf, dtype="int32")})

    return docs.select(F.col(id_col).alias(id_col),
                       F.col(text_col).alias(text_col)) \
               .mapInPandas(_tok, schema=TOKENS_SCHEMA)


def postings_from_tokens(tokens: DataFrame,
                         cfg: IndexConfig | None = None) -> DataFrame:
    """tokens(doc_id, term, tf) -> postings(term, df, total_tf,
    postings ARRAY<STRUCT<doc_id, tf>> sorted by doc_id).

    Two shapes, chosen per term by the skew pre-pass:
    - cold terms: one hash-agg (partial+final, map-side combined);
    - head terms: salted two-phase agg so the hottest term's list is built
      by ``fanout`` reducers instead of one.
    """
    cfg = cfg or IndexConfig()
    posting = F.struct(F.col("doc_id"), F.col("tf"))

    if cfg.salt_df_threshold <= 0:
        # salting disabled: single partial+final hash-agg, one shuffle
        base = tokens
        if cfg.num_partitions:
            base = base.repartition(cfg.num_partitions, "term")
        return (base.groupBy("term")
                .agg(F.sort_array(F.collect_list(posting)).alias("postings"),
                     F.count("*").alias("df"),
                     F.sum("tf").alias("total_tf"))
                .select("term", "df", "total_tf", "postings"))

    # skew pre-pass: tokens is consumed twice (df sketch + the build); the
    # caller (build_index) persists it so tokenization runs once. The SAME
    # aggregation also carries each head term's doc_id bounds, so range
    # salting needs no separate stats job (an eager min/max collect here
    # cost a full extra pass over tokens — removed round 3).
    dfreq = tokens.groupBy("term").agg(F.count("*").alias("_df"),
                                       F.min("doc_id").alias("_lo"),
                                       F.max("doc_id").alias("_hi"))
    head = (dfreq.where(F.col("_df") > cfg.salt_df_threshold)
                 .select("term",
                         F.ceil(F.col("_df") / cfg.salt_target_bucket)
                          .cast("int").alias("_fanout"),
                         "_lo", "_hi"))

    # RANGE salting on doc_id (not pmod): salt bucket k of a head term
    # covers a CONTIGUOUS doc_id range OF THAT TERM, so phase 2 merges
    # sublists by concatenating them in salt order — no re-sort of the
    # full list and no second O(df) sort buffer in the merge reducer
    # (with pmod interleaving, the merge task re-sorted the whole head
    # list and was the one to blow a bounded heap — measured in
    # scripts/bench_skew.py). Bounds are per-term (from the pre-pass), so
    # each head term balances over its own id span. The bucket map is
    # computed in double space so a full-int64 id span (hash-derived ids)
    # cannot overflow; floor of a monotone map keeps bucket order aligned
    # with doc_id order even under fp rounding, and balance only needs
    # ids ~uniform over their span (dense engine ids and hash ids both
    # are).
    pos = ((F.col("doc_id").cast("double") - F.col("_lo").cast("double"))
           / (F.col("_hi").cast("double") - F.col("_lo").cast("double")
              + F.lit(1.0)))
    raw_salt = F.floor(pos * F.col("_fanout"))
    salted = (tokens.join(F.broadcast(head), "term", "left")
                    .withColumn("salt",
                                F.coalesce(
                                    F.greatest(
                                        F.lit(0),
                                        F.least(raw_salt,
                                                F.col("_fanout") - 1))
                                    .cast("int"),
                                    F.lit(0)))
                    .drop("_fanout", "_lo", "_hi"))

    shuffle_n = cfg.num_partitions
    if shuffle_n:
        salted = salted.repartition(shuffle_n, "term", "salt")

    partial = (salted.groupBy("term", "salt")
               .agg(F.sort_array(F.collect_list(posting)).alias("plist"),
                    F.count("*").alias("n"),
                    F.sum("tf").alias("stf")))

    # ordered concat: sublists are per-bucket sorted and buckets are
    # disjoint ascending doc_id ranges -> flatten in salt order is the
    # globally sorted list
    merged = F.flatten(F.expr(
        "transform(array_sort(collect_list(struct(salt, plist))), "
        "x -> x.plist)"))
    return (partial.groupBy("term")
            .agg(merged.alias("postings"),
                 F.sum("n").alias("df"),
                 F.sum("stf").alias("total_tf"))
            .select("term", "df", "total_tf", "postings"))


def document_lengths(tokens: DataFrame) -> DataFrame:
    """documents(doc_id, doc_len) — ≙ A2 allDocuments maintenance
    (ImmutableIndex.cs:109-123) + doc length for BM25. Only docs with at
    least one term appear (words-without-documents invariant's dual)."""
    return tokens.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("doc_len"))


def term_spellings(docs: DataFrame, cfg: IndexConfig | None = None,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """docs(doc_id, text) -> (term, display_term): a stored display
    spelling per dictionary term.

    The reference keeps the FIRST-SEEN spelling as the dictionary key
    under case-insensitive comparison — a later merge of "cat" does not
    rename an existing "Cat" key (ImmutableIndex.cs:169-175). "First
    merged" is meaningless in a distributed bulk build, so the engine's
    deterministic analogue is: the spelling from the LOWEST doc_id
    containing the term, ties broken by ordinal-smallest spelling —
    stable under any partitioning and equal to the reference's answer
    whenever documents are merged in doc_id order.

    Opt-in side pass (the hot build shuffles folded terms only): the map
    side reduces each Arrow batch to distinct (term, spelling) pairs with
    their min doc_id — vocabulary-sized, not corpus-sized — and one
    map-combinable min-agg picks the winner, so the pass stays one
    cheap shuffle at any corpus size.
    """
    from textindexing_spark._pkg import ensure_shipped
    from textindexing_spark.functions.tokenize import _folder

    ensure_shipped(docs.sparkSession)
    cfg = cfg or IndexConfig()
    tokenizer = cfg.tokenizer
    fold = _folder(cfg.case_insensitive)

    def _sp(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            spell_lists = tokenize_series(pdf[text_col], tokenizer,
                                          case_insensitive=False)
            n = spell_lists.map(len).to_numpy(np.int64)
            doc_ids = np.repeat(pdf[id_col].to_numpy(np.int64), n)
            spells = [s for lst in spell_lists for s in lst]
            terms = [fold(s) for s in spells] if fold else spells
            b = pd.DataFrame({"term": terms, "spelling": spells,
                              "doc_id": doc_ids})
            yield b.groupby(["term", "spelling"], as_index=False,
                            sort=False)["doc_id"].min()

    pairs = (docs.select(F.col(id_col).alias(id_col),
                         F.col(text_col).alias(text_col))
             .mapInPandas(_sp,
                          schema="term string, spelling string, "
                                 "doc_id bigint"))
    first = F.min(F.struct(F.col("doc_id"), F.col("spelling")))
    return (pairs.groupBy("term").agg(first.alias("_first"))
            .select("term", F.col("_first.spelling").alias("display_term")))


def build_index(spark, docs: DataFrame, cfg: IndexConfig | None = None,
                id_col: str = "doc_id", text_col: str = "text"):
    """Build an Index over docs(doc_id, text, ...). See class Index."""
    from textindexing_spark.operators.query import Index

    cfg = cfg or IndexConfig()
    tokens = tokenize_documents(docs, cfg, id_col=id_col, text_col=text_col)
    if cfg.salt_df_threshold > 0:
        # the skew pre-pass reads tokens twice — persist so tokenization
        # (the expensive Python stage) runs once
        from pyspark import StorageLevel

        tokens = tokens.persist(StorageLevel.MEMORY_AND_DISK)
    postings = postings_from_tokens(tokens, cfg)
    documents = document_lengths(tokens)
    return Index(spark, postings, documents, cfg, tokens=tokens)
