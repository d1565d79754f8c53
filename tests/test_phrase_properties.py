"""Property tests for the positional codec and upsert semantics
(hypothesis) — the reference's equivalence-heavy test strategy
(SURVEY.md §5) applied to the round-3 phrase tier. Pure numpy/pandas,
no Spark session: fast enough for randomized exploration."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from textindexing_spark.operators.phrase import (_decode_pos_term,
                                                 _encode_pos_shard,
                                                 _eval_phrase,
                                                 _merge_pos_shard)


def _dec(row):
    return _decode_pos_term(row["n_docs"], row["gaps_blob"],
                            row["plens_blob"], row["pos_blob"], np)

# a (doc_id, term, positions) table: few terms, unique docs per term,
# ascending unique positions per doc
_doc_ids = st.integers(min_value=0, max_value=2**40)
_positions = st.lists(st.integers(min_value=0, max_value=100_000),
                      min_size=1, max_size=20, unique=True).map(sorted)
_terms = st.sampled_from(["a", "b", "c", "dd", "eee"])


@st.composite
def _pos_tables(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = {}
    for _ in range(n):
        key = (draw(_doc_ids), draw(_terms))
        rows[key] = draw(_positions)
    return pd.DataFrame(
        {"doc_id": [k[0] for k in rows],
         "term": [k[1] for k in rows],
         "positions": list(rows.values())})


@settings(max_examples=60, deadline=None)
@given(_pos_tables())
def test_codec_roundtrip_property(pdf):
    cols = _encode_pos_shard(0, pdf, np)
    decoded = {}
    for row in pd.DataFrame(cols).to_dict("records"):
        doc_ids, plens, starts, flat = _dec(row)
        # doc ids sorted ascending per term (layout invariant)
        assert np.all(np.diff(doc_ids) > 0)
        for j, d in enumerate(doc_ids):
            decoded[(int(d), row["term"])] = \
                flat[starts[j]:starts[j] + plens[j]].tolist()
    want = {(int(r.doc_id), r.term): list(r.positions)
            for r in pdf.itertuples()}
    assert decoded == want


@settings(max_examples=40, deadline=None)
@given(_pos_tables(), _pos_tables())
def test_upsert_merge_equals_rebuild_property(base, delta):
    """_merge_pos_shard(base, delta) decodes to exactly what encoding
    the combined (delta-wins) table would produce."""
    base_cols = pd.DataFrame(_encode_pos_shard(0, base, np))
    delta_docs = sorted(set(delta["doc_id"]))
    # delta frame as upsert builds it: positional rows + marker per doc
    markers = pd.DataFrame({"doc_id": delta_docs,
                            "term": [None] * len(delta_docs),
                            "positions": [None] * len(delta_docs)})
    merged = _merge_pos_shard((0,), base_cols,
                              pd.concat([delta, markers],
                                        ignore_index=True), np, pd)
    # exactly one row per (shard, term): a duplicate means a resident
    # row passed through while the delta re-encoded the same term (the
    # round-3 advisor bug — the decode-dict check below can't see it)
    assert not merged.duplicated(subset=["shard", "term"]).any()
    got = {}
    for row in merged.to_dict("records"):
        doc_ids, plens, starts, flat = _dec(row)
        for j, d in enumerate(doc_ids):
            got[(int(d), row["term"])] = \
                flat[starts[j]:starts[j] + plens[j]].tolist()
    want = {(int(r.doc_id), r.term): list(r.positions)
            for r in base.itertuples()
            if int(r.doc_id) not in set(delta_docs)}
    want.update({(int(r.doc_id), r.term): list(r.positions)
                 for r in delta.itertuples()})
    assert got == want


def test_merge_delete_only_batch_empties_shard():
    """A tombstone-only delta (markers, no positional rows) removes the
    docs and can empty the shard entirely."""
    base = pd.DataFrame({"doc_id": [1, 2], "term": ["x", "x"],
                         "positions": [[0], [1, 2]]})
    base_cols = pd.DataFrame(_encode_pos_shard(0, base, np))
    markers = pd.DataFrame({"doc_id": [1, 2], "term": [None, None],
                            "positions": [None, None]})
    merged = _merge_pos_shard((0,), base_cols, markers, np, pd)
    assert len(merged) == 0


@st.composite
def _token_corpora(draw):
    """Consistent documents: each doc is a token SEQUENCE; the positional
    table derives from it exactly as tokenization would."""
    n_docs = draw(st.integers(min_value=1, max_value=10))
    ids = draw(st.lists(_doc_ids, min_size=n_docs, max_size=n_docs,
                        unique=True))
    docs = {d: draw(st.lists(_terms, min_size=0, max_size=12))
            for d in ids}
    rows = {"doc_id": [], "term": [], "positions": []}
    for d, toks in docs.items():
        by_term = {}
        for p, t in enumerate(toks):
            by_term.setdefault(t, []).append(p)
        for t, ps in by_term.items():
            rows["doc_id"].append(d)
            rows["term"].append(t)
            rows["positions"].append(ps)
    return docs, pd.DataFrame(rows)


@settings(max_examples=60, deadline=None)
@given(_token_corpora(), st.lists(_terms, min_size=1, max_size=4))
def test_eval_phrase_matches_naive(corpus, phrase):
    """_eval_phrase == naive sliding-window scan over the raw token
    sequences the positional table was derived from."""
    docs, pdf = corpus
    cols = pd.DataFrame(_encode_pos_shard(0, pdf, np))
    by_term = {row["term"]: _dec(row)
               for row in cols.to_dict("records")}
    got = sorted(_eval_phrase(by_term, phrase, np))
    n = len(phrase)
    want = sorted(
        d for d, toks in docs.items()
        if any(toks[i:i + n] == phrase
               for i in range(len(toks) - n + 1)))
    assert got == want


def test_contamination_short_probe_rows(spark):
    """Probes too short to form one n-gram must still appear in the
    contamination report (n_grams=0, contamination NULL) — 'absent from
    the report' must never read as 'clean'."""
    from textindexing_spark.functions.analysis import ngram_contamination

    ddl = "doc_id bigint, text string"
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], ddl)
    probes = spark.createDataFrame(
        [(10, "alpha beta gamma"),   # long enough, fully contaminated
         (11, "zeta"),               # too short for n=3: 0 grams
         (12, None)], ddl)           # null text: 0 grams
    rows = {r["probe_id"]: r for r in
            ngram_contamination(corpus, probes, n=3).collect()}
    assert set(rows) == {10, 11, 12}
    assert rows[10]["n_grams"] == 1 and rows[10]["contamination"] == 1.0
    for pid in (11, 12):
        assert rows[pid]["n_grams"] == 0
        assert rows[pid]["n_contaminated"] == 0
        assert rows[pid]["contamination"] is None


# --- proximity (_eval_near) vs brute force -----------------------------------

@st.composite
def _near_cases(draw):
    """A tiny random corpus (token streams) + a proximity query."""
    vocab = ["a", "b", "c", "d"]
    docs = draw(st.lists(
        st.lists(st.sampled_from(vocab), min_size=1, max_size=14),
        min_size=1, max_size=8))
    toks = draw(st.lists(st.sampled_from(vocab), min_size=1, max_size=3))
    k = draw(st.integers(min_value=0, max_value=6))
    ordered = draw(st.booleans())
    return docs, toks, k, ordered


def _by_term_from_docs(docs):
    """Build the decoded-shard dict _eval_near consumes from raw token
    streams: term -> (doc_ids, plens, starts, flat positions)."""
    per_term: dict = {}
    for d, stream in enumerate(docs):
        for i, t in enumerate(stream):
            per_term.setdefault(t, {}).setdefault(d, []).append(i)
    out = {}
    for t, by_doc in per_term.items():
        doc_ids = np.array(sorted(by_doc), dtype=np.int64)
        plens = np.array([len(by_doc[d]) for d in doc_ids], dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(plens)[:-1]])
        flat = np.concatenate([np.array(by_doc[d], dtype=np.int64)
                               for d in doc_ids])
        out[t] = (doc_ids, plens, starts, flat)
    return out


@settings(max_examples=120, deadline=None)
@given(_near_cases())
def test_eval_near_matches_bruteforce_property(case):
    from itertools import product

    from textindexing_spark.operators.phrase import _eval_near

    docs, toks, k, ordered = case
    qtoks = toks if ordered else list(dict.fromkeys(toks))
    got = sorted(_eval_near(_by_term_from_docs(docs), qtoks, k,
                            ordered, np))
    want = []
    for d, stream in enumerate(docs):
        pos = {t: [i for i, w in enumerate(stream) if w == t]
               for t in set(qtoks)}
        if any(not pos[t] for t in set(qtoks)):
            continue
        for choice in product(*(pos[t] for t in qtoks)):
            if max(choice) - min(choice) > k:
                continue
            if ordered and any(b <= a
                               for a, b in zip(choice, choice[1:])):
                continue
            want.append(d)
            break
    assert got == sorted(want), (docs, qtoks, k, ordered)
