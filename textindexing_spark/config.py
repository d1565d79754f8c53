"""Engine configuration — the analogue of the reference's
``IndexerCreationOptions`` (reference: src/Primitive.Text.Indexing/Indexing/
IndexerCreationOptions.cs:20-108), re-cut for a distributed engine.

The reference lets callers choose a string comparison (default
OrdinalIgnoreCase), an index locking strategy, and a pluggable tokenizer.
In the Spark engine:

- case-insensitivity becomes a deterministic canonical case-fold
  (``str.lower`` — documented deviation from "first-seen spelling wins",
  SURVEY.md section 7.4),
- locking strategies are obviated by share-nothing execution + atomic
  snapshot commits,
- the tokenizer remains pluggable (``tokenizer`` field, see
  functions/tokenize.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    """Standard Okapi BM25 parameters (pinned in fixtures; the reference has
    boolean retrieval only — ranked retrieval is the north-star extension)."""

    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class IndexConfig:
    """Options controlling index construction and querying.

    Mirrors ``IndexerCreationOptions`` (IndexerCreationOptions.cs:20-108):
    ``tokenizer`` ≙ LineParser/TextParser choice, ``case_insensitive`` ≙
    StringComparison.OrdinalIgnoreCase default.
    """

    # Tokenizer name: 'alnum' (default, ≙ AlphaNumericWordsLineParser),
    # 'punctuation' (≙ PunctuationSplittingLineParser), or 'regex:<pattern>'
    # (≙ RegexLineParser).
    tokenizer: str = "alnum"

    # Term comparison (≙ IndexerCreationOptions.WordComparison,
    # IndexerCreationOptions.cs:20):
    #   True        ≙ OrdinalIgnoreCase (reference default): str.lower fold
    #   False       ≙ StringComparison.Ordinal: no fold
    #   "invariant" ≙ InvariantCultureIgnoreCase: NFKC + full casefold +
    #                 Latin ligature expansion, so "Schrœdinger" and
    #                 "Schroedinger" share one term
    #                 (IndexTests.cs:84-100); see functions/tokenize.py
    case_insensitive: bool | str = True

    # Number of hash partitions for the term shuffle. None = leave it to
    # spark.sql.shuffle.partitions / AQE.
    num_partitions: int | None = None

    # Head-term skew salting: terms whose document frequency exceeds
    # salt_df_threshold are split into ceil(df / salt_target_bucket) salted
    # sub-groups for the collect phase, merged in a second pass.
    # 0 disables salting.
    salt_df_threshold: int = 1_000_000
    salt_target_bucket: int = 250_000

    # Posting-block size for varbyte blocks + block-max skip metadata.
    block_size: int = 128

    # Rarest-first boolean AND pruning (≙ the reference intersecting into
    # the smallest HashSet first, IndexerViewModel.cs:84-92): resolve the
    # query tokens' document frequencies from the dictionary (a tiny
    # column-pruned scan), then broadcast-semi-join the RAREST token's doc
    # set into every other token's posting scan before the intersection
    # aggregation — so `stopword AND rare` never shuffles the stopword's
    # full postings. Applied when the rarest df is at most this bound
    # (the seed set must fit a broadcast); 0 disables the rewrite.
    bool_seed_broadcast_max: int = 4_000_000

    bm25: BM25Params = field(default_factory=BM25Params)

    def __post_init__(self):
        if isinstance(self.case_insensitive, str) \
                and self.case_insensitive != "invariant":
            raise ValueError(
                f"case_insensitive={self.case_insensitive!r}: expected "
                "True (OrdinalIgnoreCase), False (Ordinal), or "
                "'invariant' (InvariantCultureIgnoreCase)")

    # BM25 top-k default (north-star: top-10).
    default_k: int = 10
