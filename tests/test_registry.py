"""F8 IngestorSet (≙ IndexerSet.cs:60-163) and watch-loop delete
detection (≙ FileSystemDocumentSource Deleted events)."""

import datetime as dt
import glob
import os

import pytest

from textindexing_spark import IndexConfig
from textindexing_spark.sources.pages import PAGES_SCHEMA
from textindexing_spark.streaming.ingest import (
    StreamingIngestor, StreamingSegmentIngestor)
from textindexing_spark.streaming.registry import IngestorSet

T0 = dt.datetime(2024, 1, 1)


def _write(spark, rows, path):
    spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def test_ingestor_set_add_remove_purges_source(spark, tmp_path):
    """Two sources into ONE shared index; removing one stops it and
    purges its documents everywhere (IndexerSet.cs:148-163 ->
    RemoveFromIndex); duplicate sources are rejected (:96-99); removing
    an unknown source is a no-op (:152-155)."""
    src_a = str(tmp_path / "src_a")
    src_b = str(tmp_path / "src_b")
    _write(spark, [("a1", T0, None, "apple banana", "en"),
                   ("a2", T0, None, "banana cherry", "en")], src_a)
    _write(spark, [("b1", T0, None, "cherry dates", "en")], src_b)

    iset = IngestorSet(spark, str(tmp_path / "shared_idx"),
                       n_term_buckets=8, n_doc_buckets=4)
    iset.add(src_a)
    iset.add(src_b)
    with pytest.raises(ValueError, match="already included"):
        iset.add(src_a)
    iset.drain()

    idx = iset.index()
    assert idx.search_bool("banana").count() == 2
    assert idx.search_bool("cherry").count() == 2  # one from each source
    assert idx.documents.count() == 3

    # remove source A: its docs vanish, B's survive
    iset.remove(src_a)
    assert iset.sources == [src_b]
    idx = iset.index()
    assert idx.search_bool("banana").count() == 0
    assert idx.search_bool("apple").count() == 0
    assert idx.search_bool("cherry").count() == 1
    assert idx.documents.count() == 1

    iset.remove(str(tmp_path / "nonexistent"))  # no-op, no raise

    # a url provided by BOTH live sources survives removal of one
    src_c = str(tmp_path / "src_c")
    src_d = str(tmp_path / "src_d")
    shared = ("shared_url", T0, None, "elderberry fig", "en")
    _write(spark, [shared], src_c)
    _write(spark, [shared, ("d1", T0, None, "grape", "en")], src_d)
    iset.add(src_c)
    iset.add(src_d)
    iset.drain()
    assert iset.index().search_bool("elderberry").count() == 1
    iset.remove(src_c)
    assert iset.index().search_bool("elderberry").count() == 1  # still in D
    iset.remove(src_d)
    assert iset.index().search_bool("elderberry").count() == 0
    assert iset.index().search_bool("grape").count() == 0


def test_remove_never_mints_ids_for_unmapped_provenance(spark, tmp_path):
    """A provenance row can exist for a url that never reached the id
    table (provenance append landed, merge crashed before committing).
    remove() must NOT mint a fresh doc_id for it — tombstoning a
    document that never existed would pollute the id space."""
    src = str(tmp_path / "src")
    _write(spark, [("u1", T0, None, "alpha beta", "en")], src)
    iset = IngestorSet(spark, str(tmp_path / "idx"),
                       n_term_buckets=8, n_doc_buckets=4)
    ing = iset.add(src)
    iset.drain()
    n_ids = ing.url_ids.mapping().count()

    # simulate the crash: a provenance url with no id-table entry
    spark.createDataFrame([("ghost_url",)], "url string") \
        .coalesce(1).write.mode("append").parquet(ing.prov_path)

    iset.remove(src)
    assert ing.url_ids.mapping().count() == n_ids  # no new ids minted
    assert iset.index().search_bool("alpha").count() == 0  # purge worked


def test_per_source_parser_config(spark, tmp_path):
    """Each source can carry its own parser (≙ per-Indexer ITextParser,
    IndexerSet.cs:118-133): a punctuation-split source and the default
    alnum source feed one index."""
    src_a = str(tmp_path / "sa")
    src_b = str(tmp_path / "sb")
    _write(spark, [("u1", T0, None, "foo_bar baz", "en")], src_a)
    _write(spark, [("u2", T0, None, "foo_bar qux", "en")], src_b)

    iset = IngestorSet(spark, str(tmp_path / "idx"),
                       n_term_buckets=8, n_doc_buckets=4)
    iset.add(src_a)  # default alnum: foo_bar -> foo, bar
    iset.add(src_b, IndexConfig(tokenizer="regex:[a-z_]+"))  # keeps foo_bar
    iset.drain()
    idx = iset.index()
    assert idx.search_bool("foo").count() == 1      # only u1
    assert idx.search_bool("foo_bar").count() == 1  # only u2


@pytest.mark.parametrize("cls,kw", [
    (StreamingIngestor, {"n_term_buckets": 8, "n_doc_buckets": 4}),
    (StreamingSegmentIngestor, {"n_shards": 4}),
])
def test_reconcile_deletes_drops_vanished_urls(spark, tmp_path, cls, kw):
    """A url that disappears from the source listing (file deleted on
    disk) is tombstoned out of the index on reconcile — the watcher's
    Deleted event (FileSystemDocumentSource.cs:120-140) as a
    listing-vs-documents anti-join."""
    src = str(tmp_path / "src")
    _write(spark, [("u1", T0, None, "alpha beta", "en"),
                   ("u2", T0, None, "gamma delta", "en")], src)
    first_files = set(glob.glob(f"{src}/*.parquet"))
    _write(spark, [("u3", T0, None, "epsilon", "en")], src)

    ing = cls(spark, str(tmp_path / "idx"), **kw)
    ing.ingest_available(src, str(tmp_path / "ck"))
    idx = ing.index()
    n_q = (idx.search_bool("alpha").count() if hasattr(idx, "search_bool")
           else idx.search_bm25("alpha", 5).count())
    assert n_q == 1

    # crawler dropped the first file: u1, u2 vanish from the listing
    for f in first_files:
        os.remove(f)
    ing.reconcile_deletes(src)
    idx = ing.index()
    if hasattr(idx, "search_bool"):
        assert idx.search_bool("alpha").count() == 0
        assert idx.search_bool("gamma").count() == 0
        assert idx.search_bool("epsilon").count() == 1
        assert idx.documents.count() == 1
    else:
        assert idx.search_bm25("alpha", 5).count() == 0
        assert idx.search_bm25("epsilon", 5).count() == 1
        assert idx.documents_df().count() == 1

    # idempotent: nothing more to delete
    v = ing.reconcile_deletes(src)
    assert v >= 1


def test_registry_reconcile_respects_other_sources(spark, tmp_path):
    """IngestorSet.reconcile: a url that vanished from source A's
    listing is purged — unless source B still provides it."""
    import glob as _glob
    import os as _os

    src_a = str(tmp_path / "ra")
    src_b = str(tmp_path / "rb")
    shared = ("both_url", T0, None, "kiwi lemon", "en")
    _write(spark, [("a_only", T0, None, "mango", "en"), shared], src_a)
    a_files = set(_glob.glob(f"{src_a}/*.parquet"))
    _write(spark, [shared], src_b)

    iset = IngestorSet(spark, str(tmp_path / "ridx"),
                       n_term_buckets=8, n_doc_buckets=4)
    iset.add(src_a)
    iset.add(src_b)
    iset.drain()
    assert iset.index().search_bool("mango").count() == 1
    assert iset.index().search_bool("kiwi").count() == 1

    # drop source A's file: a_only AND both_url vanish from A's listing
    for f in a_files:
        _os.remove(f)
    # A must still list SOMETHING for the schema read; write empty marker
    _write(spark, [("a_new", T0, None, "nectarine", "en")], src_a)
    iset.drain(src_a)
    iset.reconcile(src_a)
    idx = iset.index()
    assert idx.search_bool("mango").count() == 0       # gone with A
    assert idx.search_bool("kiwi").count() == 1        # B still has it
    assert idx.search_bool("nectarine").count() == 1   # new A doc intact


def test_drain_unknown_source_raises(spark, tmp_path):
    iset = IngestorSet(spark, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="unknown source"):
        iset.drain("/nope")


def test_per_source_identity_same_url_is_two_documents(spark, tmp_path):
    """identity='per_source' — exact reference parity: documents are
    keyed by (source, url) (DocumentInfo.cs:60-65; per-Indexer sources,
    IndexerSet.cs:118-133), so the SAME url fed by two sources indexes
    as TWO documents, and remove(source) purges exactly that source's
    copy."""
    from textindexing_spark.streaming.registry import split_identity

    src_a = str(tmp_path / "pa")
    src_b = str(tmp_path / "pb")
    shared = ("dup_url", T0, None, "orange papaya", "en")
    _write(spark, [shared, ("a_solo", T0, None, "quince", "en")], src_a)
    _write(spark, [shared], src_b)

    iset = IngestorSet(spark, str(tmp_path / "pidx"),
                       n_term_buckets=8, n_doc_buckets=4,
                       identity="per_source")
    iset.add(src_a)
    iset.add(src_b)
    iset.drain()

    idx = iset.index()
    assert idx.documents.count() == 3          # dup_url twice + a_solo
    assert idx.search_bool("orange").count() == 2  # one per source

    # split_identity recovers (source, url) for display
    ing = iset._sources[iset._key(src_a)]
    rows = split_identity(ing.url_ids.mapping()).collect()
    assert {(r["source"], r["url"]) for r in rows} == {
        (src_a, "dup_url"), (src_a, "a_solo"), (src_b, "dup_url")}

    # removing A drops A's copy of dup_url AND a_solo; B's copy survives
    iset.remove(src_a)
    idx = iset.index()
    assert idx.search_bool("orange").count() == 1
    assert idx.search_bool("quince").count() == 0
    assert idx.documents.count() == 1
    iset.remove(src_b)
    assert iset.index().documents.count() == 0


def test_per_source_identity_reconcile_is_source_local(spark, tmp_path):
    """identity='per_source' reconcile: a url vanishing from source A's
    listing tombstones A's document even though B still provides the
    same url — identities are namespaced, so B's copy is untouched."""
    import glob as _glob
    import os as _os

    src_a = str(tmp_path / "qa")
    src_b = str(tmp_path / "qb")
    shared = ("both_url", T0, None, "raisin squash", "en")
    _write(spark, [shared], src_a)
    a_files = set(_glob.glob(f"{src_a}/*.parquet"))
    _write(spark, [shared], src_b)

    iset = IngestorSet(spark, str(tmp_path / "qidx"),
                       n_term_buckets=8, n_doc_buckets=4,
                       identity="per_source")
    iset.add(src_a)
    iset.add(src_b)
    iset.drain()
    assert iset.index().search_bool("raisin").count() == 2

    for f in a_files:
        _os.remove(f)
    _write(spark, [("a_new", T0, None, "tamarind", "en")], src_a)
    iset.drain(src_a)
    iset.reconcile(src_a)
    idx = iset.index()
    assert idx.search_bool("raisin").count() == 1    # A's copy gone
    assert idx.search_bool("tamarind").count() == 1  # new A doc intact

    # calling the ingestor-level reconcile DIRECTLY must stay
    # source-local too (the raw base-class anti-join would have called
    # every composite key vanished and purged B's documents)
    ing_b = iset._sources[iset._key(src_b)]
    ing_b.reconcile_deletes(src_b)
    idx = iset.index()
    assert idx.search_bool("raisin").count() == 1    # B's copy survives
    assert idx.search_bool("tamarind").count() == 1

    # reconcile CONVERGES: a second tick with nothing newly vanished
    # must not commit a redundant tombstone version (the id mapping is
    # append-only — deleted urls stay in it forever, so reconciling
    # against the mapping instead of the index's documents would
    # re-detect the same deletion every tick)
    ing_a = iset._sources[iset._key(src_a)]
    v_before = ing_a.store.latest_version()
    iset.reconcile(src_a)
    assert ing_a.store.latest_version() == v_before


def test_reconcile_deletes_url_vanished_from_every_source(spark, tmp_path):
    """A url deleted from BOTH sources' directories must tombstone:
    the keep-check reads the other sources' LIVE listings — an
    anti-join against their append-only provenance tables would keep
    the url alive forever (each source's provenance still records it).
    Repeated reconcile must also be idempotent: no new version when
    nothing changed (the append-only id mapping outlives deletion)."""
    import glob as _glob
    import os as _os

    src_a = str(tmp_path / "ga")
    src_b = str(tmp_path / "gb")
    shared = ("everywhere_url", T0, None, "papaya guava", "en")
    _write(spark, [shared, ("a_keep", T0, None, "apple", "en")], src_a)
    _write(spark, [shared, ("b_keep", T0, None, "banana", "en")], src_b)

    iset = IngestorSet(spark, str(tmp_path / "gidx"),
                       n_term_buckets=8, n_doc_buckets=4)
    iset.add(src_a)
    iset.add(src_b)
    iset.drain()
    assert iset.index().search_bool("papaya").count() == 1

    # remove the shared url from BOTH directories (rewrite each without it)
    for src, keep in ((src_a, ("a_keep", T0, None, "apple", "en")),
                      (src_b, ("b_keep", T0, None, "banana", "en"))):
        for f in _glob.glob(f"{src}/*.parquet"):
            _os.remove(f)
        _write(spark, [keep], src)

    iset.reconcile(src_a)
    iset.reconcile(src_b)
    idx = iset.index()
    assert idx.search_bool("papaya").count() == 0  # gone from everywhere
    assert idx.search_bool("apple").count() == 1
    assert idx.search_bool("banana").count() == 1

    # idempotence: another tick with no changes commits no new version
    ing = next(iter(iset._sources.values()))
    v_before = ing.store.latest_version()
    iset.reconcile(src_a)
    iset.reconcile(src_b)
    assert ing.store.latest_version() == v_before


def test_remove_retryable_after_failed_commit(spark, tmp_path):
    """remove() must deregister the source only AFTER the purge
    commits: a failed commit leaves the source registered so the
    caller can retry (popping first would make the retry a silent
    no-op and strand the documents in the index)."""
    src = str(tmp_path / "rr")
    _write(spark, [("u1", T0, None, "quince", "en")], src)
    iset = IngestorSet(spark, str(tmp_path / "rridx"),
                       n_term_buckets=8, n_doc_buckets=4)
    iset.add(src)
    iset.drain()
    assert iset.index().search_bool("quince").count() == 1

    ing = next(iter(iset._sources.values()))
    real = ing.store.commit_merge
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated concurrent writer")
        return real(*a, **kw)

    ing.store.commit_merge = flaky
    with pytest.raises(RuntimeError, match="simulated"):
        iset.remove(src)
    assert iset._sources  # still registered -> retry is possible
    iset.remove(src)
    assert not iset._sources
    assert iset.index().search_bool("quince").count() == 0
