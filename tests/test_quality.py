"""Round-4 curation/serving extensions: repetition signals, PII scan,
duplicate clustering, spelling suggestions, snippets, domain rollups."""

import pytest
from pyspark.sql import functions as F

from textindexing_spark.config import IndexConfig
from textindexing_spark.functions.analysis import domain_stats, snippets
from textindexing_spark.functions.quality import (
    pii_scan, redact_pii, repetition_signals)
from textindexing_spark.operators.build import build_index
from textindexing_spark.operators.dedup import duplicate_clusters


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# --- repetition_signals -------------------------------------------------------

def test_repetition_dup_lines(spark):
    rows = [(0, "alpha beta\nalpha beta\ngamma delta"),
            (1, "one two three four")]
    out = {r["doc_id"]: r for r in
           repetition_signals(_docs(spark, rows)).collect()}
    # doc 0: 3 non-blank lines, one a repeat -> 1/3
    assert out[0]["n_lines"] == 3
    assert out[0]["dup_line_frac"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert out[1]["dup_line_frac"] == 0.0


def test_repetition_top_and_dup_ngrams(spark):
    # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] -> top 'a b' x3
    # of 5; 3-grams = [a b a, b a b, a b a, b a b] -> all repeated
    rows = [(0, "a b a b a b")]
    r = repetition_signals(_docs(spark, rows)).collect()[0]
    assert r["n_tokens"] == 6
    assert r["top_2gram_frac"] == pytest.approx(3 * 2 / 6, abs=1e-6)
    assert r["dup_3gram_frac"] == pytest.approx(1.0, abs=1e-6)


def test_repetition_short_doc_zeroes(spark):
    # one token: no 2-grams/3-grams -> fractions 0, never null/error
    r = repetition_signals(_docs(spark, [(0, "solo")])).collect()[0]
    assert r["top_2gram_frac"] == 0.0
    assert r["dup_3gram_frac"] == 0.0
    assert r["n_tokens"] == 1


def test_repetition_equal_ngram_sizes(spark):
    # top_n == dup_n must not double-count the shared gram stream:
    # "a b a b a b" 2-grams = 5 total, top 'a b' x3, repeated mass 5/5
    r = repetition_signals(_docs(spark, [(0, "a b a b a b")]),
                           top_n=2, dup_n=2).collect()[0]
    assert r["top_2gram_frac"] == pytest.approx(1.0, abs=1e-6)
    assert r["dup_2gram_frac"] == pytest.approx(1.0, abs=1e-6)
    with pytest.raises(ValueError):
        repetition_signals(_docs(spark, [(0, "x")]), top_n=0)


def test_symbol_ratio(spark):
    # 4 symbols ($$, ==) over 2 tokens
    r = repetition_signals(_docs(spark, [(0, "ab $$ cd ==")])).collect()[0]
    assert r["symbol_ratio"] == pytest.approx(4 / 2, abs=1e-6)


# --- pii ----------------------------------------------------------------------

def test_pii_scan_counts_and_redaction(spark):
    rows = [(0, "mail a.b+c@ex-ample.org or b@x.io, host 192.168.0.1, "
                "call 555-123-4567 or +4917012345"),
            (1, "no pii here at all")]
    out = {r["doc_id"]: r for r in pii_scan(_docs(spark, rows)).collect()}
    assert (out[0]["n_emails"], out[0]["n_ipv4"], out[0]["n_phones"]) \
        == (2, 1, 2)
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) \
        == (0, 0, 0)
    red = {r["doc_id"]: r["text"]
           for r in redact_pii(_docs(spark, rows)).collect()}
    assert "<EMAIL>" in red[0] and "<IP>" in red[0] and "<PHONE>" in red[0]
    assert "a.b+c@ex-ample.org" not in red[0]
    assert "192.168.0.1" not in red[0]
    assert red[1] == "no pii here at all"


# --- curate (composed pipeline) -----------------------------------------------

def test_curate_filters_dedups_and_redacts(spark):
    from textindexing_spark.functions.quality import curate

    base = ("the quick brown fox jumps over a lazy dog while birds "
            "sing in tall green trees near clear cold water")
    near = base.replace("cold", "warm")
    rows = [
        (0, base),                               # survives (cluster keeper)
        (1, near),                               # near-dup of 0 -> dropped
        (2, "spam spam spam spam spam spam spam spam spam spam"),  # repeat
        (3, "too short"),                        # < min_tokens
        (4, "independent document about completely different topics "
            "with plenty of distinct words mail me at a@b.co now"),
    ]
    out = curate(_docs(spark, rows), min_tokens=5,
                 dedup_threshold=0.4).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [0, 4]
    text4 = next(r["text"] for r in out if r["doc_id"] == 4)
    assert "<EMAIL>" in text4 and "a@b.co" not in text4


def test_curate_no_redact_preserves_text(spark):
    from textindexing_spark.functions.quality import curate

    rows = [(0, "mail x@y.io plus many other perfectly normal words "
                "to stay above every quality threshold easily")]
    out = curate(_docs(spark, rows), min_tokens=5, redact=False).collect()
    assert "x@y.io" in out[0]["text"]


# --- duplicate_clusters -------------------------------------------------------

def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "a bigint, b bigint")


def test_clusters_components(spark):
    # {1,2,3} chained, {7,9} pair, 5 absent (not in any pair)
    out = dict(duplicate_clusters(
        _pairs(spark, [(1, 2), (2, 3), (7, 9)])).collect())
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_clusters_long_chain_converges(spark):
    # a 30-node path: worst case for plain propagation; pointer jumping
    # must still converge within the default max_iters
    n = 30
    out = dict(duplicate_clusters(
        _pairs(spark, [(i, i + 1) for i in range(n)])).collect())
    assert set(out.values()) == {0}
    assert len(out) == n + 1


def test_clusters_matches_rebuild_after_merge_order(spark):
    # order of pairs must not matter
    p1 = [(4, 2), (9, 8), (2, 9)]
    out = dict(duplicate_clusters(_pairs(spark, p1)).collect())
    assert out == {2: 2, 4: 2, 8: 2, 9: 2}


def test_clusters_empty_pairs(spark):
    assert duplicate_clusters(_pairs(spark, [])).count() == 0


def test_clusters_match_union_find_on_random_graphs(spark):
    """Seeded random graphs vs a pure-Python union-find (union by min
    root => every tree's final root IS its component's minimum)."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        pairs = sorted({tuple(sorted(rng.sample(range(20), 2)))
                        for _ in range(15)})
        parent = list(range(20))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            parent[max(ra, rb)] = min(ra, rb)
        want = {n: find(n) for p in pairs for n in p}
        got = dict(duplicate_clusters(_pairs(spark, pairs)).collect())
        assert got == want, seed


# --- suggest ------------------------------------------------------------------

def test_suggest_ranks_by_distance_then_df(spark):
    docs = _docs(spark, [
        (0, "table table table cable fable"),
        (1, "table cable stable"),
    ])
    idx = build_index(spark, docs, IndexConfig())
    got = [(r["term"], r["dist"]) for r in
           idx.suggest("tabl", k=3, max_dist=2).collect()]
    # dist 1: table; dist 2: cable/fable/stable -> df desc, term asc
    assert got[0] == ("table", 1)
    assert got[1] == ("cable", 2)
    assert got[2] in (("fable", 2), ("stable", 2))


def test_suggest_respects_max_dist(spark):
    docs = _docs(spark, [(0, "completely unrelated words")])
    idx = build_index(spark, docs, IndexConfig())
    assert idx.suggest("zzz", k=5, max_dist=1).count() == 0
    assert idx.suggest("", k=5).count() == 0
    assert idx.suggest(None, k=5).count() == 0


def test_suggest_matches_bruteforce(spark):
    """Ranking equals a pure-Python Levenshtein brute force over the
    dictionary for several probes."""
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    docs = _docs(spark, [
        (0, "grape graph grasp apple maple staple sample simple"),
        (1, "grape apple apple maple tuple people"),
    ])
    idx = build_index(spark, docs, IndexConfig())
    vocab = {r["term"]: int(r["df"])
             for r in idx.postings.select("term", "df").collect()}
    for probe in ("grape", "aple", "peple", "xx"):
        want = sorted(
            ((t, df, lev(t, probe)) for t, df in vocab.items()
             if abs(len(t) - len(probe)) <= 2 and lev(t, probe) <= 2),
            key=lambda x: (x[2], -x[1], x[0]))[:4]
        got = [(r["term"], int(r["df"]), int(r["dist"]))
               for r in idx.suggest(probe, k=4, max_dist=2).collect()]
        assert got == want, probe


# --- snippets -----------------------------------------------------------------

def test_snippet_window_and_clamp(spark):
    docs = _docs(spark, [
        (0, "needle at the very start of this document"),
        (1, "some long preamble text before the needle appears here"),
        (2, "no match in this one"),
    ])
    out = {r["doc_id"]: r for r in snippets(docs, "needle", 10).collect()}
    assert set(out) == {0, 1}
    assert out[0]["pos"] == 1
    assert out[0]["snippet"].startswith("needle")
    assert len(out[0]["snippet"]) <= 26  # 2*10 + len('needle')
    assert "needle" in out[1]["snippet"]


def test_snippet_case_folds(spark):
    docs = _docs(spark, [(0, "The Needle is capitalized")])
    out = snippets(docs, "NEEDLE", 5).collect()
    assert len(out) == 1 and "Needle" in out[0]["snippet"]


# --- curation-in-stream + describe ---------------------------------------------

def test_streaming_ingestor_transform_filters_and_redacts(spark, tmp_path):
    from pyspark.sql import functions as F

    from textindexing_spark.functions.quality import redact_pii
    from textindexing_spark.streaming.ingest import StreamingIngestor

    rows = [
        ("u://a", "write to me at someone@example.net about the index"),
        ("u://b", "tiny"),                       # dropped by the filter
        ("u://c", "perfectly ordinary document text here"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "url string, text string") \
        .coalesce(1).write.parquet(src)

    def curate_batch(pages):
        keep = pages.where(
            F.size(F.split(F.col("text"), "\\s+")) >= 3)
        return redact_pii(keep)

    ing = StreamingIngestor(spark, str(tmp_path / "idx"),
                            transform=curate_batch)
    ing.ingest_available(src, str(tmp_path / "ckpt"))
    idx = ing.index()
    terms = {r["term"] for r in idx.postings.collect()}
    assert "tiny" not in terms          # filtered out before indexing
    assert "email" in terms             # '<EMAIL>' tokenizes to 'email'
    assert "someone" not in terms       # the address never got indexed
    assert "index" in terms


def test_index_describe(spark):
    docs = _docs(spark, [
        (0, "alpha beta alpha"),
        (1, "alpha gamma"),
        (2, ""),
    ])
    idx = build_index(spark, docs, IndexConfig())
    d = idx.describe(top_terms=2)
    assert d["n_docs"] == 2             # the empty doc is never indexed
    assert d["n_terms"] == 3            # alpha beta gamma
    assert d["n_postings"] == 4         # alpha x2, beta, gamma
    assert d["n_tokens"] == 5
    assert d["avgdl"] == pytest.approx(2.5)
    assert d["head_terms"][0] == ("alpha", 2)
    assert len(d["head_terms"]) == 2


# --- domain_stats -------------------------------------------------------------

def test_domain_stats_rollup(spark):
    pages = spark.createDataFrame(
        [("https://a.com/x", "hello world", "en"),
         ("https://a.com/y", "more text!", "en"),
         ("doc://b.org/1", "autre texte", "fr")],
        "url string, text string, lang string")
    out = {r["host"]: r for r in domain_stats(pages).collect()}
    assert out["a.com"]["n_docs"] == 2
    assert out["a.com"]["total_chars"] == len("hello world") + len(
        "more text!")
    assert out["a.com"]["n_langs"] == 1
    assert out["b.org"]["n_docs"] == 1


def test_top_ngram_frac_capped_for_overlapping_repeats(spark):
    # 'ok ok ok': the 2-gram 'ok ok' occurs twice over 3 tokens; the
    # uncapped count*n/n_tokens formula gives 4/3 — the signal must be
    # a [0, 1] fraction
    out = repetition_signals(_docs(spark, [(0, "ok ok ok")])).collect()[0]
    assert out["top_2gram_frac"] == pytest.approx(1.0, abs=1e-6)


def test_null_text_signals_match_empty_text(spark):
    # NULL and '' are the same 'no content' case: all-zero signals,
    # never NULLs that silently vanish from both sides of a filter
    rows = [(0, None), (1, "")]
    out = {r["doc_id"]: r for r in
           repetition_signals(_docs(spark, rows)).collect()}
    for c in ("n_lines", "dup_line_frac", "n_tokens", "symbol_ratio",
              "top_2gram_frac", "dup_3gram_frac"):
        assert out[0][c] == out[1][c] == 0, c


def test_deduplicate_null_text_rows_all_survive(spark):
    """md5(NULL) is NULL, and an unguarded groupBy fuses every
    unreadable doc into ONE class — deduplicate() must keep every
    NULL-text row (each is its own class) and exact_duplicates must
    exclude them from the report."""
    from textindexing_spark.operators.dedup import (deduplicate,
                                                    exact_duplicates)

    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, None)],
        "doc_id bigint, text string")
    kept = sorted(r["doc_id"] for r in deduplicate(docs).collect())
    assert kept == [1, 3, 4, 5]  # one 'same' survivor + all NULL rows
    rep = exact_duplicates(docs).collect()
    assert len(rep) == 1 and rep[0]["n_dups"] == 2


def test_clusters_with_string_doc_ids(spark):
    """Every upstream pair generator accepts string doc ids (URLs,
    content hashes); duplicate_clusters must cluster them to their
    lexicographic minimum instead of aborting on an ANSI bigint cast."""
    from textindexing_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [("urlB", "urlA"), ("urlB", "urlC"), ("urlX", "urlY")],
        "a string, b string")
    got = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters(pairs).collect()}
    assert got == {"urlA": "urlA", "urlB": "urlA", "urlC": "urlA",
                   "urlX": "urlX", "urlY": "urlX"}
