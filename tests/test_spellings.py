"""term_spellings — the deterministic stored-spelling analogue of the
reference's first-seen dictionary keys (ImmutableIndex.cs:169-175: under
OrdinalIgnoreCase a later merge of "cat" does not rename an existing
"Cat" key). Engine rule: spelling from the lowest doc_id, ties by
ordinal-smallest spelling."""

import pytest

from textindexing_spark.config import IndexConfig
from textindexing_spark.operators.build import term_spellings


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _display(df):
    return {r["term"]: r["display_term"] for r in df.collect()}


def test_lowest_doc_id_spelling_wins(spark):
    # doc 1 spells it "Cat"; doc 2 merges "cat" later (by id order) —
    # the stored key stays "Cat", exactly the reference's behavior when
    # documents are merged in doc_id order (ImmutableIndex.cs:169-175).
    d = _display(term_spellings(_docs(spark, [
        (1, "Cat chased"), (2, "cat cats dog")])))
    assert d["cat"] == "Cat"
    assert d["dog"] == "dog"
    # reversed ids -> reversed winner (the rule is id order, not luck)
    d2 = _display(term_spellings(_docs(spark, [
        (2, "Cat chased"), (1, "cat cats dog")])))
    assert d2["cat"] == "cat"


def test_tie_within_one_doc_breaks_ordinal(spark):
    # same doc carries two spellings: ordinal-smallest wins ("CAT" < "Cat")
    d = _display(term_spellings(_docs(spark, [(7, "Cat CAT cAT")])))
    assert d["cat"] == "CAT"


def test_ordinal_mode_is_identity(spark):
    cfg = IndexConfig(case_insensitive=False)
    d = _display(term_spellings(_docs(spark, [(1, "Cat cat")]), cfg))
    assert d == {"Cat": "Cat", "cat": "cat"}


def test_invariant_mode_collapses_ligature(spark):
    # the IndexTests.cs:84-100 family: one folded key, display from the
    # first doc in id order
    cfg = IndexConfig(case_insensitive="invariant")
    d = _display(term_spellings(_docs(spark, [
        (1, "Schrœdinger"), (2, "Schroedinger")]), cfg))
    assert set(d) == {"schroedinger"}
    assert d["schroedinger"] == "Schrœdinger"


def test_matches_single_node_oracle(spark):
    # random-ish mixed-case corpus vs a pure-Python reimplementation
    import random

    rng = random.Random(42)
    words = ["Alpha", "beta", "GAMMA", "delta", "alpha", "Beta", "gamma"]
    rows = [(i, " ".join(rng.choice(words)
                         for _ in range(rng.randint(1, 8))))
            for i in range(1, 41)]
    best: dict[str, tuple[int, str]] = {}
    for did, text in rows:
        for sp in text.split():
            key = sp.lower()
            cand = (did, sp)
            if key not in best or cand < best[key]:
                best[key] = cand
    expect = {k: v[1] for k, v in best.items()}
    got = _display(term_spellings(_docs(spark, rows)))
    assert got == expect


def test_invalid_mode_fails_loudly(spark):
    with pytest.raises(ValueError):
        term_spellings(_docs(spark, [(1, "x")]),
                       IndexConfig(case_insensitive="ordinal")).collect()


def test_invariant_spellings_cover_index_dictionary(spark):
    """End-to-end IndexTests.cs:84-100 mirror: under
    case_insensitive='invariant' the spellings table's keys must equal
    the INDEX dictionary's term identities exactly (every postings term
    joins to one display spelling, none dangle), and each display is a
    verbatim first-seen original, not a folded form."""
    from textindexing_spark.operators.build import build_index

    cfg = IndexConfig(case_insensitive="invariant")
    rows = [(1, "Schrœdinger straße MASSE"),
            (2, "Schroedinger strasse masse"),
            (3, "Naïve naive NAÏVE œuvre")]
    docs = _docs(spark, rows)
    idx = build_index(spark, docs, cfg)
    index_terms = {r["term"] for r in idx.postings.collect()}
    spell = _display(term_spellings(docs, cfg))
    assert set(spell) == index_terms
    # folded identity collapses the ligature/eszett variants to one key
    assert "schroedinger" in index_terms
    # display = the lowest-doc_id original spelling, unfolded
    assert spell["schroedinger"] == "Schrœdinger"
    originals = {s for _, t in rows for s in t.split()}
    assert set(spell.values()) <= originals
