"""Tokenizers — the engine's scalar-function layer.

Reimplements the reference's parser family with exactly-pinned character
classes (reference: src/Primitive.Text.Indexing/Parsers/):

- ``alnum``      ≙ AlphaNumericWordsLineParser (AlphaNumericWordsLineParser.cs:7-15):
                 maximal runs of ``char.IsLetterOrDigit`` characters, i.e.
                 Unicode categories Lu,Ll,Lt,Lm,Lo (letters) + Nd (decimal
                 digits). This is the reference's DEFAULT parser
                 (IndexerCreationOptions.cs:102-108).
- ``punctuation`` ≙ PunctuationSplittingLineParser (PunctuationSplittingLineParser.cs:11-26):
                 word char = NOT(punctuation OR whitespace) — keeps '$', '='.
- ``regex:<pat>`` ≙ RegexLineParser (RegexLineParser.cs:18,40-45): all matches
                 of a user pattern; the reference's shipped default is \\w+.

Semantics carried over (SURVEY.md section 1.4 / 2.2):

- Tokens never span newlines (the reference parses line-by-line,
  LineTextParser.cs:72-80) — guaranteed here because \\r \\n are non-word
  chars in every tokenizer.
- Case-insensitive term identity (OrdinalIgnoreCase default): canonical
  ``str.lower()`` fold. Documented deviation: the reference keeps the
  first-seen spelling as the stored key (ImmutableIndex.cs:169-175); we store
  the canonical fold — deterministic under any partitioning, which
  "first-seen" is not in a distributed build.
- Per-document SET semantics with tf kept on the side
  (Indexer.cs:248-258 dedups into a SortedSet; BM25 needs tf, a strict
  extension).

Exactness note (SURVEY.md section 7.4): Python's ``\\w`` is NOT
char.IsLetterOrDigit — it additionally matches '_' and the Nl/No numeric
categories. We therefore match ``[^\\W_]+`` (C-speed) and post-split the
rare tokens containing Nl/No chars via a per-char exactness check
(``isalpha`` = L* exactly, ``isdecimal`` = Nd exactly).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from functools import lru_cache

# --- pure-Python reference tokenizers (also the single-node oracle) --------

# \w without underscore: L* + Nd + Nl + No (superset of .NET IsLetterOrDigit).
_ALNUM_CANDIDATE = re.compile(r"[^\W_]+", re.UNICODE)

@lru_cache(maxsize=65536)
def _is_word_char_alnum(ch: str) -> bool:
    """Exactly .NET char.IsLetterOrDigit: L* (isalpha) or Nd (isdecimal)."""
    return ch.isalpha() or ch.isdecimal()


def _alnum_fixup(token: str) -> list[str]:
    """Split a candidate token at chars outside L*+Nd (Nl/No digits etc.)."""
    out: list[str] = []
    cur: list[str] = []
    for ch in token:
        if _is_word_char_alnum(ch):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def _tokenize_alnum(text: str) -> list[str]:
    toks: list[str] = []
    for t in _ALNUM_CANDIDATE.findall(text):
        # Fast path: pure ASCII alnum candidates are always exact.
        if t.isascii():
            toks.append(t)
        else:
            toks.extend(_alnum_fixup(t))
    return toks


import unicodedata as _ud

_PUNCT_CATS = frozenset(("Pc", "Pd", "Ps", "Pe", "Pi", "Pf", "Po"))


@lru_cache(maxsize=65536)
def _is_word_char_punct(ch: str) -> bool:
    return not (ch.isspace() or _ud.category(ch) in _PUNCT_CATS)


def _tokenize_punctuation(text: str) -> list[str]:
    out: list[str] = []
    cur: list[str] = []
    for ch in text:
        if _is_word_char_punct(ch):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def get_tokenizer(name: str) -> Callable[[str], list[str]]:
    """Resolve a tokenizer config string to a callable (≙ the reference's
    pluggable ILineParser, Parsers/ILineParser.cs:12-21 — pure, stateless)."""
    if name == "alnum":
        return _tokenize_alnum
    if name == "punctuation":
        return _tokenize_punctuation
    if name.startswith("regex:"):
        pat = re.compile(name[len("regex:"):], re.UNICODE)
        # finditer + group(0): findall would return CAPTURES (strings
        # or tuples) for any user pattern containing a group —
        # r'(\w)+' silently tokenizing 'hello' as ['o'], a grouped
        # pattern crashing the fold step on tuples. The token is
        # always the full match, as in the reference's RegexLineParser.
        return lambda text: [m.group(0) for m in pat.finditer(text)]
    raise ValueError(f"unknown tokenizer {name!r}")


# --- term folding (≙ the reference's pluggable StringComparison) ------------
#
# case_insensitive accepts three values, mirroring
# IndexerCreationOptions.WordComparison (IndexerCreationOptions.cs:20):
#   False       ≙ StringComparison.Ordinal (no fold)
#   True        ≙ OrdinalIgnoreCase (the reference default): str.lower()
#   "invariant" ≙ InvariantCultureIgnoreCase: NFKC + full Unicode case
#                 fold + the Latin ligature expansions invariant-culture
#                 comparison treats as equal — the reference's
#                 "Schrœdinger" == "Schroedinger" family
#                 (tests/.../Indexing/IndexTests.cs:84-100). This is a
#                 deterministic approximation of ICU collation (full
#                 linguistic collation needs ICU tables this sandbox
#                 doesn't ship); it covers every equality the reference
#                 test suite exercises.

_LIGATURES = {"œ": "oe", "æ": "ae"}  # NFKC+casefold handles ß/ﬁ/ﬀ/…


@lru_cache(maxsize=65536)
def fold_invariant(token: str) -> str:
    t = _ud.normalize("NFKC", token).casefold()
    for lig, exp in _LIGATURES.items():
        if lig in t:
            t = t.replace(lig, exp)
    return t


def _folder(case_insensitive) -> Callable[[str], str] | None:
    if case_insensitive == "invariant":
        return fold_invariant
    if isinstance(case_insensitive, str):
        # Only one string mode exists; a typo ("Invariant") or a guessed
        # mode ("ordinal") must fail loudly, not silently build an
        # OrdinalIgnoreCase index (use False for Ordinal).
        raise ValueError(
            f"case_insensitive={case_insensitive!r}: expected True "
            "(OrdinalIgnoreCase), False (Ordinal), or 'invariant' "
            "(InvariantCultureIgnoreCase)")
    if case_insensitive:
        return str.lower
    return None


def tokenize_text(text: str | None, tokenizer: str = "alnum",
                  case_insensitive=True) -> list[str]:
    """Tokenize one document's text (oracle entry point). Missing content
    yields an empty token list ≙ delete semantics (SURVEY.md 1.4.2)."""
    if not text:
        return []
    toks = get_tokenizer(tokenizer)(text)
    fold = _folder(case_insensitive)
    if fold is not None:
        toks = [fold(t) for t in toks]
    return toks


def tokenize_with_tf(text: str | None, tokenizer: str = "alnum",
                     case_insensitive=True) -> list[tuple[str, int]]:
    """(term, tf) pairs sorted by term — the per-document aggregate the
    reference builds as a SortedSet (Indexer.cs:248-258) extended with tf."""
    counts: dict[str, int] = {}
    for t in tokenize_text(text, tokenizer, case_insensitive):
        counts[t] = counts.get(t, 0) + 1
    return sorted(counts.items())


# --- SQL-side equivalents (for DuckDB oracle parity) ------------------------

# RE2 / Spark-regex class equal to char.IsLetterOrDigit. Used in oracle SQL
# (DuckDB regexp_extract_all) and pure-Catalyst query paths. On the synthetic
# corpora this is byte-identical to _tokenize_alnum; the golden-fixture tests
# pin the Python implementation as truth for exotic categories.
SQL_TOKEN_PATTERN = r"[\p{L}\p{Nd}]+"


# --- vectorized (Arrow batch) form, used inside pandas UDFs -----------------

def tokenize_series(texts, tokenizer: str = "alnum",
                    case_insensitive=True):
    """pandas.Series[str] -> pandas.Series[list[str]] — Arrow-batched path.

    ``str.findall`` runs the regex in C per row; the exactness fixup touches
    only tokens with non-ASCII chars (rare in web text after case folding).
    """
    import pandas as pd

    fold = _folder(case_insensitive)
    if tokenizer == "alnum":
        cand = texts.fillna("").str.findall(_ALNUM_CANDIDATE)
        if fold is not None:
            return cand.map(
                lambda ts: [
                    fold(w)
                    for t in ts
                    for w in ((t,) if t.isascii() else _alnum_fixup(t))
                ]
            )
        return cand.map(
            lambda ts: [w for t in ts
                        for w in ((t,) if t.isascii() else _alnum_fixup(t))]
        )
    fn = get_tokenizer(tokenizer)
    if fold is not None:
        return texts.fillna("").map(lambda s: [fold(t) for t in fn(s)])
    return texts.fillna("").map(fn)
