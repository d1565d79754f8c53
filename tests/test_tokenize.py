"""Golden tokenizer tests — pin the exact char classes of the reference
parsers (SURVEY.md 2.2, FIXTURES.md section 4). No Spark needed."""

import pandas as pd
import pytest

from textindexing_spark.functions.tokenize import (
    get_tokenizer,
    tokenize_series,
    tokenize_text,
    tokenize_with_tf,
)

# (input, expected alnum tokens before case fold)
ALNUM_GOLDEN = [
    # basic splitting on punctuation/space (AlphaNumericWordsLineParser)
    ("Hello, world!", ["Hello", "world"]),
    # underscores split (char.IsLetterOrDigit excludes '_' — unlike \w)
    ("under_score splits", ["under", "score", "splits"]),
    # digits-only version tokens (FIXTURES.md: "4.1.2" -> 4, 1, 2)
    ("version 4.1.2", ["version", "4", "1", "2"]),
    # Russian UTF-8 (reference fixture class: Hyperonim.txt)
    ("Гиперо́ним — слово", ["Гиперо", "ним", "слово"]),  # U+0301 is Mn, splits
    # mixed scripts, accents are letters (é = Ll)
    ("naïve café tête-à-tête", ["naïve", "café", "tête", "à", "tête"]),
    # œ is a letter; ordinal semantics keep Schrœdinger ≠ Schroedinger
    ("Schrœdinger", ["Schrœdinger"]),
    # tokens never span newlines (line-by-line parsing, LineTextParser)
    ("end\nstart", ["end", "start"]),
    ("end\r\nstart", ["end", "start"]),
    # superscript two U+00B2 is category No — NOT IsLetterOrDigit -> splits
    ("x²y", ["x", "y"]),
    # Roman numeral Ⅷ U+2167 is Nl — NOT IsLetterOrDigit -> splits
    ("aⅧb", ["a", "b"]),
    # empty / punctuation-only
    ("", []),
    ("... !!! ---", []),
]


@pytest.mark.parametrize("text,expected", ALNUM_GOLDEN)
def test_alnum_golden(text, expected):
    assert get_tokenizer("alnum")(text) == expected


def test_alnum_case_fold():
    # OrdinalIgnoreCase identity: Cat and cat are one key; canonical fold
    assert tokenize_text("Cat CAT cat") == ["cat", "cat", "cat"]
    assert tokenize_with_tf("Cat CAT cat dog") == [("cat", 3), ("dog", 1)]


def test_punctuation_tokenizer():
    # PunctuationSplittingLineParser keeps $ and = (not punctuation)
    assert get_tokenizer("punctuation")("a=b $5 c,d") == ["a=b", "$5", "c", "d"]
    # hyphen is Pd -> splits
    assert get_tokenizer("punctuation")("tête-à-tête") == ["tête", "à", "tête"]


def test_regex_tokenizer():
    # RegexLineParser with the reference's shipped default \w+
    assert get_tokenizer(r"regex:\w+")("a_b c") == ["a_b", "c"]


def test_tokenize_series_matches_scalar():
    texts = [t for t, _ in ALNUM_GOLDEN] + ["Cat CAT cat"]
    ser = tokenize_series(pd.Series(texts))
    for text, got in zip(texts, ser):
        assert got == tokenize_text(text), text


def test_none_text_is_empty():
    # missing content => empty token set => delete semantics (SURVEY 1.4.2)
    assert tokenize_text(None) == []
    assert list(tokenize_series(pd.Series([None, "a"]))) == [[], ["a"]]


def test_invariant_culture_fold():
    """InvariantCultureIgnoreCase mode (IndexTests.cs:84-100): ligature
    and sharp-s spellings collapse to one term; default OrdinalIgnoreCase
    keeps them distinct."""
    inv = tokenize_text("Schrœdinger Schroedinger STRASSE Straße",
                        case_insensitive="invariant")
    assert inv == ["schroedinger", "schroedinger", "strasse", "strasse"]
    ordinal_ci = tokenize_text("Schrœdinger Schroedinger")
    assert ordinal_ci == ["schrœdinger", "schroedinger"]  # distinct terms
    # series path matches the scalar path
    ser = tokenize_series(pd.Series(["Schrœdinger Schroedinger"]),
                          case_insensitive="invariant")
    assert list(ser) == [["schroedinger", "schroedinger"]]


def test_unknown_case_mode_raises():
    """Only True/False/'invariant' are valid — a typo or guessed mode
    ('ordinal', 'Invariant') must fail loudly, not silently fall back
    to the str.lower fold."""
    import pytest
    from textindexing_spark.config import IndexConfig
    from textindexing_spark.functions.tokenize import tokenize_text

    with pytest.raises(ValueError, match="case_insensitive"):
        tokenize_text("Hello", case_insensitive="ordinal")
    with pytest.raises(ValueError, match="case_insensitive"):
        IndexConfig(case_insensitive="Invariant")
    # the three documented modes still work
    assert tokenize_text("Hello", case_insensitive=True) == ["hello"]
    assert tokenize_text("Hello", case_insensitive=False) == ["Hello"]
    assert tokenize_text("Schrœdinger",
                         case_insensitive="invariant") == ["schroedinger"]


def test_regex_tokenizer_groups_and_repetition():
    r"""The token is always the FULL match: findall would return group
    captures for any user pattern containing a capturing group —
    r'(\w)+' silently tokenizing 'hello' as ['o'], a multi-group
    pattern crashing the fold step on tuples."""
    from textindexing_spark.functions.tokenize import tokenize_text

    assert tokenize_text("hello world", r"regex:(\w)+") \
        == ["hello", "world"]
    assert tokenize_text("abc-123 x-9", r"regex:([A-Za-z]+)-(\d+)") \
        == ["abc-123", "x-9"]
    assert tokenize_text("a1 b2", r"regex:[a-z]\d") == ["a1", "b2"]
