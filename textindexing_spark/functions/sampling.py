"""Deterministic sampling / splitting / mixture building for
training-data pipelines.

Everything keys on ``xxhash64(id, seed)`` — membership is a pure
function of (id, seed), NOT of partitioning, executor count, or row
order, unlike ``DataFrame.sample`` (whose Bernoulli draw depends on
partition-level RNG streams and changes under repartitioning). That
buys three properties pipelines rely on:

- reproducibility: the same (corpus, seed, rate) always selects the
  same documents on any cluster size;
- monotonicity: raising the rate only ADDS documents (a 10% sample is
  a subset of the 50% sample) — growing a training set never churns
  the part already trained on;
- disjointness by construction: split buckets partition the hash
  space, so train/val/test can never leak into each other.

The reference has no sampling layer; these are training-data
extensions (same family as dedup/quality). All pure Catalyst — scale
is partitioning only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# hash bucket resolution: u in [0, 1) with 1e-6 granularity
_BUCKETS = 1_000_000


def _unit(col, seed: int):
    """Deterministic u(id) in [0, 1): xxhash64 folded to a bucket."""
    h = F.xxhash64(col, F.lit(int(seed)))
    return ((F.pmod(h, F.lit(_BUCKETS))).cast("double")
            / float(_BUCKETS))


def hash_sample(docs: DataFrame, rate: float, seed: int = 0,
                id_col: str = "doc_id") -> DataFrame:
    """Keep each row iff u(id) < rate — deterministic, monotone in
    ``rate``, independent of partitioning."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return docs.where(_unit(F.col(id_col), seed) < float(rate))


def hash_split(docs: DataFrame, weights: dict[str, float],
               seed: int = 0, id_col: str = "doc_id",
               split_col: str = "split") -> DataFrame:
    """Add ``split_col`` assigning every row to exactly one named
    bucket with the given weights (normalized; e.g. {"train": 0.98,
    "val": 0.01, "test": 0.01}). Buckets are contiguous hash ranges in
    the listed order, so growing one weight at the expense of a LATER
    one never reassigns rows between the earlier buckets."""
    if not weights:
        raise ValueError("need at least one split")
    if any(w < 0 for w in weights.values()) or \
            sum(weights.values()) <= 0:
        raise ValueError("split weights must be >= 0 with a positive sum")
    total = float(sum(weights.values()))
    u = _unit(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        branch = F.when(u < acc, F.lit(name))
        expr = branch if expr is None else expr.when(u < acc,
                                                     F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return docs.withColumn(split_col, expr)


def mixture_plan(docs: DataFrame, shares: dict[str, float],
                 token_budget: int, source_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """(source, share, n_docs, n_tokens, target_tokens, rate) — the
    per-source sampling plan that hits ``token_budget`` total tokens at
    the given source SHARES (normalized). ``rate`` is capped at 1.0: a
    source too small for its share under-fills rather than duplicating
    (upsampling is epoch repetition, a training-loop concern — the
    shortfall is visible in the plan). One aggregation over the corpus;
    the plan is a driver-scale table (one row per source)."""
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    if not shares or any(s < 0 for s in shares.values()) or \
            sum(shares.values()) <= 0:
        raise ValueError("shares must be >= 0 with a positive sum")
    total = float(sum(shares.values()))
    share_rows = [(k, v / total) for k, v in sorted(shares.items())]
    spark = docs.sparkSession
    share_df = spark.createDataFrame(share_rows,
                                     f"{source_col} string, share double")
    stats = (docs.groupBy(source_col)
             .agg(F.count("*").alias("n_docs"),
                  # maximal non-whitespace runs: split keeps empty
                  # leading/trailing fields, so an unfiltered size()
                  # would double-count every newline-terminated doc
                  # and halve the computed sampling rate
                  F.sum(F.size(F.filter(
                      F.split(F.col(text_col), r"\s+"),
                      lambda t: t != F.lit(""))))
                  .alias("n_tokens")))
    return (share_df.join(stats, source_col, "left")
            .select(source_col, "share",
                    F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.round(F.col("share") * float(token_budget))
                    .cast("bigint").alias("target_tokens"))
            .withColumn("rate", F.when(
                F.col("n_tokens") > 0,
                F.least(F.lit(1.0),
                        F.col("target_tokens")
                        / F.col("n_tokens").cast("double")))
                .otherwise(F.lit(0.0))))


def mixture_sample(docs: DataFrame, shares: dict[str, float],
                   token_budget: int, seed: int = 0,
                   source_col: str = "source", id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Sample ``docs`` so each source contributes ~its share of
    ``token_budget`` whitespace tokens: the ``mixture_plan`` rates
    drive a per-source ``hash_sample`` (sources absent from ``shares``
    are dropped). The per-source rate table is tiny and broadcast;
    membership stays a pure function of (id, seed), so re-running the
    plan after adding corpus data keeps previously-selected documents
    selected (rates only move with the stats)."""
    plan = mixture_plan(docs, shares, token_budget,
                        source_col=source_col, text_col=text_col)
    rates = F.broadcast(plan.select(source_col, "rate"))
    u = _unit(F.col(id_col), seed)
    return (docs.join(rates, source_col)
            .where(u < F.col("rate"))
            .drop("rate"))


def chunk_tokens(docs: DataFrame, window: int, overlap: int = 0,
                 id_col: str = "doc_id", text_col: str = "text"
                 ) -> DataFrame:
    """Split each document's whitespace-token stream into training
    windows of ``window`` tokens starting every ``window - overlap``
    tokens — (id, chunk_id, start, n_tokens, chunk_text), the
    context-window chunking step ahead of sequence packing. The tail
    chunk keeps its partial window; a trailing start whose tokens are
    all inside the previous chunk is dropped (with overlap, the last
    stride can be fully covered — emitting it would duplicate tokens).

    Pure Catalyst — split/slice/posexplode, no Python, no shuffle: a
    narrow per-row projection at any corpus size."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if not 0 <= overlap < window:
        raise ValueError(f"overlap must be in [0, window), got {overlap}")
    step = window - overlap
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.size(F.col("_toks"))
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(step)),
        lambda s: (s == 0) | (s < n - overlap))
    return (docs
            .select(F.col(id_col), toks.alias("_toks"))
            # trim leaves [''] for blank text: a 1-element array of the
            # empty token, not an empty array
            .where((n > 1) | (F.element_at("_toks", 1) != ""))
            .select(id_col, "_toks",
                    F.posexplode(starts).alias("chunk_id", "start"))
            .select(id_col, "chunk_id", "start",
                    F.slice("_toks", F.col("start") + 1, window)
                    .alias("_chunk"))
            .select(id_col, "chunk_id", "start",
                    F.size("_chunk").alias("n_tokens"),
                    F.array_join("_chunk", " ").alias("chunk_text")))


def pack_sequences(chunks: DataFrame, budget: int,
                   n_buckets: int | None = None, seed: int = 0,
                   id_cols: tuple[str, ...] = ("doc_id", "chunk_id"),
                   size_col: str = "n_tokens") -> DataFrame:
    """Pack chunks into training sequences of at most ``budget`` tokens
    (first-fit-decreasing): adds ``seq_id`` (which sequence) and
    ``seq_pos`` (order within it) to every input row. A chunk larger
    than ``budget`` fails loudly — truncation belongs upstream in
    ``chunk_tokens``.

    Scale shape: bin packing is made embarrassingly parallel by
    hash-bucketing chunks on their ids (ONE shuffle), then packing each
    bucket independently in an Arrow-batched applyInPandas — no global
    coordination, and the only packing loss vs a single global FFD is
    each bucket's final partially-filled bin, negligible when buckets
    hold thousands of chunks. Every assignment is a pure function of
    (ids, seed, n_buckets): bucket = xxhash64(ids, seed), in-bucket
    order = (size desc, ids asc), so the output is deterministic on any
    cluster size or input partitioning."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = chunks.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in chunks.schema.fields]
        + ["seq_id bigint", "seq_pos int"])
    keys = [str(c) for c in id_cols]
    size = str(size_col)
    cap = int(budget)

    def _pack(pdf):
        import pandas as pd

        bucket = int(pdf["_bucket"].iloc[0])
        pdf = pdf.sort_values(
            by=[size] + keys, ascending=[False] + [True] * len(keys),
            kind="mergesort").reset_index(drop=True)
        too_big = pdf[size].iloc[0] if len(pdf) else 0
        if too_big > cap:
            raise ValueError(
                f"chunk of {too_big} tokens exceeds the packing "
                f"budget {cap} — split it upstream (chunk_tokens "
                f"window <= budget)")
        remaining: list[int] = []  # capacity left per open bin
        counts: list[int] = []  # rows already placed per bin
        seq_ids, seq_pos = [], []
        for sz in pdf[size]:
            sz = int(sz)
            for b, room in enumerate(remaining):
                if sz <= room:
                    break
            else:
                b = len(remaining)
                remaining.append(cap)
                counts.append(0)
            remaining[b] -= sz
            seq_ids.append((bucket << 32) | b)
            seq_pos.append(counts[b])
            counts[b] += 1
        pdf = pdf.drop(columns=["_bucket"])
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_pos"] = pd.Series(seq_pos, dtype="int32")
        return pdf

    bucket = F.pmod(F.xxhash64(*[F.col(k) for k in keys],
                               F.lit(int(seed))),
                    F.lit(int(n_buckets)))
    return (chunks.withColumn("_bucket", bucket)
            .groupBy("_bucket").applyInPandas(_pack, out_schema))
