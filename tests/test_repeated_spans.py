"""Exact-substring (cross-document repeated k-gram) dedup: spans vs a
brute-force Python oracle; strip reconstruction semantics."""

import re

import pytest

from textindexing_spark.operators.dedup import (
    repeated_spans, strip_repeated_spans)

_TOK = re.compile(r"[^\W_]+", re.UNICODE)

BOILER = "this site uses cookies to improve your experience ok"  # 9 toks
CORPUS = [
    (0, f"alpha beta gamma. {BOILER} unique tail zero"),
    (1, f"{BOILER} middle words here. {BOILER} again closing"),
    (2, "completely unrelated document body nothing shared at all"),
    (3, f"Prefix words. {BOILER.upper()} and a different ending"),  # case
    (4, "short doc"),  # < k tokens: never shingled
    # within-document repetition also counts toward min_count
    (5, "repeat me now please again soon. repeat me now please again "
        "soon. distinct finale"),
]


def _toks(t):
    return [w.lower() for w in _TOK.findall(t)]


def _oracle_spans(k=6, min_count=2):
    grams = {}
    for d, t in CORPUS:
        ts = _toks(t)
        for i in range(len(ts) - k + 1):
            grams.setdefault(tuple(ts[i:i + k]), []).append((d, i))
    flagged = {}
    for g, occ in grams.items():
        if len(occ) >= min_count:
            for d, i in occ:
                flagged.setdefault(d, set()).add(i)
    spans = []
    for d, poss in flagged.items():
        run = None
        for p in sorted(poss):
            if run and p <= run[1] + k:
                run[1] = p
            else:
                if run:
                    spans.append((d, run[0], run[1] + k))
                run = [p, p]
        spans.append((d, run[0], run[1] + k))
    return sorted(spans)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def test_spans_match_bruteforce_oracle(docs):
    for k, mc in ((6, 2), (4, 2), (6, 3)):
        got = sorted((r["doc_id"], r["start"], r["end"]) for r in
                     repeated_spans(docs, k=k, min_count=mc).collect())
        assert got == _oracle_spans(k, mc), (k, mc)


def test_spans_cover_expected_docs(docs):
    got = {r["doc_id"] for r in repeated_spans(docs, k=6).collect()}
    # boilerplate docs 0/1/3 (case-insensitive), self-repeating doc 5;
    # never the unrelated doc 2 or the too-short doc 4
    assert got == {0, 1, 3, 5}


def test_strip_removes_all_occurrences_keeps_rest(spark, docs):
    cleaned = {r["doc_id"]: r["text"] for r in
               strip_repeated_spans(docs, k=6).collect()}
    boiler_toks = BOILER.split()
    for d in (0, 1, 3):
        low = cleaned[d].lower().split()
        for j in range(len(low) - len(boiler_toks) + 1):
            assert low[j:j + len(boiler_toks)] != boiler_toks, d
    # span-FREE docs keep their original text byte-for-byte
    # (punctuation, case — downstream char-sensitive stages see it)
    assert cleaned[2] == CORPUS[2][1]
    assert cleaned[4] == CORPUS[4][1]
    # surviving tokens keep original case (doc 3's span was uppercase)
    assert cleaned[3].startswith("Prefix words")
    assert "unique tail zero" in cleaned[0]


def test_strip_positions_align_when_lower_changes_token_count(spark):
    """Java lower() splits 'İ' into 'i' + a combining mark; positions
    must index the RAW token stream or every span lands one token off
    in such docs."""
    boiler = "alpha beta gamma delta epsilon zeta"
    rows = [(0, f"İstanbul haberleri {boiler} kalan metin"),
            (1, f"unrelated opener {boiler} different tail")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    cleaned = {r["doc_id"]: r["text"] for r in
               strip_repeated_spans(docs, k=6).collect()}
    assert cleaned[0] == "İstanbul haberleri kalan metin"
    assert cleaned[1] == "unrelated opener different tail"


def test_repeated_spans_validates_params(docs):
    with pytest.raises(ValueError):
        repeated_spans(docs, k=0)
    with pytest.raises(ValueError):
        repeated_spans(docs, min_count=1)
    with pytest.raises(ValueError):  # internal-column collision guard
        strip_repeated_spans(docs.withColumn("__tix_sp", docs.doc_id))


def test_curate_strip_boilerplate_stage(spark):
    """curate(strip_boilerplate=k): the shared banner is stripped before
    quality filtering, so two docs that differ ONLY in the banner no
    longer near-dup-match each other, and the banner never reaches the
    survivors' text."""
    from textindexing_spark.functions.quality import curate

    from textindexing_spark.operators.dedup import ngram_jaccard_pairs

    banner = " ".join(f"w{i}" for i in range(30))
    # remainders need >= 11 distinct tokens: a once-occurring 2-gram
    # over n tokens scores 2/n on top_2gram_frac vs the 0.20 default
    rows = [
        (0, f"{banner} totally original research about engines and "
            "trains moving quickly through mountain passes"),
        (1, f"{banner} different prose describing cooking recipes "
            "with fresh basil tomatoes garlic butter sauce"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["text"]
           for r in curate(docs, min_tokens=5, redact=False,
                           strip_boilerplate=6).collect()}
    assert set(out) == {0, 1}          # neither doc lost to near-dup
    for t in out.values():
        assert "w0 w1" not in t        # banner gone
    # control (exhaustive verifier, no LSH recall involved): WITHOUT the
    # strip, the 30-token shared banner makes the pair a near-duplicate
    assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 1
    stripped = curate(docs, min_tokens=0, redact=False,
                      strip_boilerplate=6)
    assert ngram_jaccard_pairs(stripped, threshold=0.5).count() == 0


def test_curate_redacts_before_strip(spark):
    """With strip_boilerplate on, redaction runs FIRST: the strip's
    token-level rebuild would otherwise destroy the @ / . characters
    the PII regexes need, shipping the address unredacted."""
    from textindexing_spark.functions.quality import curate

    banner = " ".join(f"w{i}" for i in range(30))
    rows = [(0, f"{banner} mail me at alice@example.net about trains "
                "moving quickly through scenic mountain passes"),
            (1, f"{banner} different prose describing cooking recipes "
                "with fresh basil tomatoes garlic butter sauce")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["text"]
           for r in curate(docs, min_tokens=5, redact=True,
                           strip_boilerplate=6).collect()}
    assert "alice" not in out[0] and "example" not in out[0]
    assert "EMAIL" in out[0]  # the placeholder's tokens survive


def test_strip_accepts_precomputed_spans(spark, docs):
    spans = repeated_spans(docs, k=6)
    a = sorted(map(tuple,
                   strip_repeated_spans(docs, spans=spans).collect()))
    b = sorted(map(tuple, strip_repeated_spans(docs, k=6).collect()))
    assert a == b
    with pytest.raises(TypeError):  # spans is keyword-only: the k-shaped
        strip_repeated_spans(docs, 6)  # positional call must not bind it
