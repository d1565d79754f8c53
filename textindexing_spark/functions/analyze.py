"""Analyzer chain: stopword removal, accent folding, light stemming —
applied to documents BEFORE indexing and to query strings with the SAME
pipeline, so index-time and query-time terms agree by construction.

Design: the chain is a document TRANSFORM (like `functions.quality.
curate`), not an index mode. `normalize_docs` rewrites the text column
token-by-token in one Arrow-batched pandas pass; any tier (boolean
Index, SegmentIndex, positional) then indexes the normalized text
unchanged, and it plugs straight into the streaming ingest hook
(`StreamingIngestor(transform=...)`). Query side, `normalize_query`
runs the identical per-term pipeline over a query string (boolean
operators and wildcard markers pass through untouched).

The engine internals stay untouched — no new branch in any tokenizer or
query path, so a non-analyzed index behaves exactly as before.

Semantics (documented simplifications, standard for analyzer chains):

- order per token: case fold (the index's own fold) -> accent fold ->
  stopword drop -> stem; stopwords are matched in folded+accent-folded
  space, so one stopword list covers "The"/"the"/"thé".
- accent folding = NFD, strip combining marks (Mn), NFC: "café"→"cafe",
  "naïve"→"naive". Distinct from the invariant CASE fold
  (tokenize.fold_invariant), which deliberately preserves accents.
- stem="light" is Harman's S-stemmer (Harman 1991, "How effective is
  suffixing?"): -ies→-y (unless -eies/-aies), -es→-e (unless
  -aes/-ees/-oes), else drop final -s (unless -us/-ss). Conservative,
  language-blind for non-English (words without those endings pass
  through), no dictionary.
- stopword removal before a POSITIONAL index makes formerly-separated
  words adjacent ("the quick fox" -> phrase "quick fox" matches);
  that's the classic analyzer trade-off — skip stopwords for corpora
  that need exact phrase fidelity.

Scale shape: one mapInPandas-free pandas_udf projection per document —
per-row work, no shuffle, composes with whatever partitioning the
downstream build chooses. The reference has no analyzer layer (its
IndexerCreationOptions stop at tokenizer + comparison,
IndexerCreationOptions.cs:20-108); this is a training-data/search
extension on top.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from textindexing_spark.functions.tokenize import (
    _folder, tokenize_series)


@lru_cache(maxsize=65536)
def fold_accents(token: str) -> str:
    """Strip combining marks: NFD-decompose, drop Mn, recompose."""
    if token.isascii():
        return token
    return unicodedata.normalize(
        "NFC", "".join(ch for ch in unicodedata.normalize("NFD", token)
                       if unicodedata.category(ch) != "Mn"))


def stem_light(token: str) -> str:
    """Harman's S-stemmer: the three -s suffix rules, first match wins;
    never stems tokens shorter than 4 chars (keeps "is", "des", ids)."""
    if len(token) < 4 or not token.endswith("s"):
        return token
    if token.endswith("ies"):
        return token if token.endswith(("eies", "aies")) else \
            token[:-3] + "y"
    if token.endswith("es"):
        return token if token.endswith(("aes", "ees", "oes")) else \
            token[:-1]
    return token if token.endswith(("us", "ss")) else token[:-1]


def make_term_analyzer(*, stopwords=None, accents: bool = False,
                       stem: str | None = None,
                       case_insensitive=True):
    """list[str] -> list[str] analyzer over already-tokenized terms.
    ``stopwords`` may be given in any case/accent form — they are
    normalized once into the same folded space the terms pass through."""
    if stem not in (None, "light"):
        raise ValueError(f"stem={stem!r}: expected None or 'light'")
    fold = _folder(case_insensitive) or (lambda t: t)
    stop = None
    if stopwords:
        stop = {fold_accents(fold(w)) if accents else fold(w)
                for w in stopwords}

    def analyze(tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            if accents:
                t = fold_accents(t)
            if stop is not None and t in stop:
                continue
            if stem == "light":
                t = stem_light(t)
            out.append(t)
        return out

    return analyze


def normalize_series(texts, *, tokenizer: str = "alnum",
                     case_insensitive=True, stopwords=None,
                     accents: bool = False, stem: str | None = None):
    """pandas.Series[str] -> pandas.Series[str]: tokenize with the
    index's own tokenizer+fold, run the analyzer chain, re-join with
    single spaces (the alnum/punctuation tokenizers re-tokenize a
    space-joined string to exactly the same terms)."""
    analyze = make_term_analyzer(
        stopwords=stopwords, accents=accents, stem=stem,
        case_insensitive=case_insensitive)
    toks = tokenize_series(texts, tokenizer, case_insensitive)
    return toks.map(lambda ts: " ".join(analyze(ts)))


def normalize_docs(docs: DataFrame, *, text_col: str = "text",
                   tokenizer: str = "alnum", case_insensitive=True,
                   stopwords=None, accents: bool = False,
                   stem: str | None = None) -> DataFrame:
    """Rewrite ``text_col`` through the analyzer chain (all other
    columns pass through). NULL text stays NULL (delete semantics
    preserved). One Arrow-batched projection; no shuffle."""
    # validate options eagerly on the driver, not first-task-failure
    make_term_analyzer(stopwords=stopwords, accents=accents, stem=stem,
                       case_insensitive=case_insensitive)
    stop_t = tuple(sorted(stopwords)) if stopwords else None

    @pandas_udf("string")
    def _norm(texts):
        out = normalize_series(
            texts, tokenizer=tokenizer, case_insensitive=case_insensitive,
            stopwords=stop_t, accents=accents, stem=stem)
        return out.where(texts.notna(), None)

    return docs.withColumn(text_col, _norm(F.col(text_col)))


def normalize_query(query_text: str | None, *, tokenizer: str = "alnum",
                    case_insensitive=True, stopwords=None,
                    accents: bool = False, stem: str | None = None) -> str:
    """Apply the SAME chain to a query string for use with
    ``search_bool`` / ``search_bm25`` / phrase search: each
    whitespace-separated word is analyzed independently; boolean
    operators (AND/OR/NOT), parentheses, quotes, and wildcard markers
    (*) pass through untouched, so the output feeds ``search_expr``
    too. A stopword query word disappears (same as index side)."""
    from textindexing_spark.functions.tokenize import tokenize_text

    import re

    analyze = make_term_analyzer(
        stopwords=stopwords, accents=accents, stem=stem,
        case_insensitive=case_insensitive)
    out: list[str] = []
    for raw in (query_text or "").split(" "):
        if not raw:
            continue
        core = raw.strip('()"*')
        if raw in ("AND", "OR", "NOT") or not core:
            out.append(raw)
            continue
        # a fuzzy suffix (word~ / word~d) is query syntax, not word
        # material: analyze the word, re-attach the suffix. Any digit
        # run is kept as suffix — a malformed distance like '~3' must
        # reach parse_bool_expr's ValueError, not silently tokenize
        # into two plain terms
        fz = re.fullmatch(r"([^~]+)(~\d*)", core)
        suffix = ""
        if fz:
            word, suffix = fz.group(1), fz.group(2)
        else:
            word = core
        toks = tokenize_text(word, tokenizer, case_insensitive)
        terms = analyze(toks)
        if terms and suffix:
            terms = terms[:-1] + [terms[-1] + suffix]
        if not terms:
            # the word was stopworded away; keep any structural chars
            # it carried ("(the" -> "(") so parens/quotes stay balanced
            # — a stopword that was an operator's only operand is the
            # caller's query-design problem, same as on the index side.
            # The word's wildcard markers go WITH the word: a kept '*'
            # would become a bare match-everything term ('the*' with
            # 'the' stopworded must not turn into '*', which routes as
            # a full-dictionary scan)
            residue = raw.replace(core, "").replace("*", "")
            if residue:
                out.append(residue)
            continue
        out.append(raw.replace(core, " ".join(terms)))
    return " ".join(out)
