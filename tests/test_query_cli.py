"""Query-CLI coverage for the round-4 serving features: keyset
pagination, synonym expansion, analyzer-chain query rewrite, facets."""

import importlib.util
import json
import pathlib

import pytest

from textindexing_spark import IndexConfig, build_index

CORPUS = [
    (0, "fast merge scan", "en", "web"),
    (1, "quick merge scan", "en", "books"),
    (2, "rapid merge scan", "de", "web"),
    (3, "slow merge scan", "en", "web"),
    (4, "fast merge scan extra fast", "fr", None),
]


def _cli():
    repo = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "query_index_submit", repo / "scripts" / "query_index_submit.py")
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    return cli


@pytest.fixture(scope="module")
def snapshot(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    docs = spark.createDataFrame(
        CORPUS, "doc_id bigint, text string, lang string, source string")
    ix = build_index(spark, docs.select("doc_id", "text"), IndexConfig())
    ix.snapshot(str(root / "ix"))
    docs.write.mode("overwrite").parquet(str(root / "meta"))
    return root


def test_cli_synonyms_and_facets(spark, snapshot, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    _cli().main([
        "--index", str(snapshot / "ix"), "--mode", "expr",
        "--query", "fast AND merge",
        "--synonyms", json.dumps({"fast": ["quick", "rapid"]}),
        "--facet", "lang", "--facet", "source",
        "--facet-table", str(snapshot / "meta")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["results"] == [0, 1, 2, 4]
    assert out["executed_query"] == \
        "(fast OR quick OR rapid) AND merge"
    facets = {(f, v): n for f, v, n in out["facets"]}
    assert facets[("lang", "en")] == 2
    assert facets[("lang", "de")] == 1
    assert facets[("source", "web")] == 2
    assert facets[("source", None)] == 1


def test_cli_bm25_pagination(spark, snapshot, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    cli = _cli()
    cli.main(["--index", str(snapshot / "ix"), "--mode", "bm25",
              "--query", "fast merge", "--k", "2"])
    p1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(p1["results"]) == 2
    # the CLI's OWN output must drive its pagination: next_after carries
    # the raw (repr round-tripped) score, not the rounded display value
    cli.main(["--index", str(snapshot / "ix"), "--mode", "bm25",
              "--query", "fast merge", "--k", "2",
              "--after", p1["next_after"]])
    p2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ids1 = [d for d, _ in p1["results"]]
    ids2 = [d for d, _ in p2["results"]]
    assert not set(ids1) & set(ids2)
    from textindexing_spark import Index
    ix = Index.load(spark, str(snapshot / "ix"))
    full = [r["doc_id"] for r in ix.search_bm25("fast merge", 10).collect()]
    assert ids1 + ids2 == full[:len(ids1) + len(ids2)]


def test_cli_analyzer_rewrite(spark, snapshot, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    # naturally-written list with spaces: ' the' must still stop 'the'
    _cli().main(["--index", str(snapshot / "ix"), "--mode", "bool",
                 "--query", "the Fást merge", "--stopwords", "the, a",
                 "--fold-accents"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["executed_query"] == "fast merge"
    assert out["results"] == [0, 4]


def test_cli_bm25f_mode(spark, snapshot, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    titles = spark.createDataFrame(
        [(0, "fast guide"), (1, "other"), (2, "other"), (3, "other"),
         (4, "misc")], "doc_id bigint, text string")
    tix = build_index(spark, titles, IndexConfig())
    tix.snapshot(str(tmp_path / "tix"))
    _cli().main(["--index", str(snapshot / "ix"), "--mode", "bm25f",
                 "--title-index", str(tmp_path / "tix"),
                 "--title-weight", "8.0", "--query", "fast", "--k", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # doc 0: 'fast' in title AND body — must outrank the body-only hits
    assert out["results"][0][0] == 0
    assert {d for d, _ in out["results"]} == {0, 4}


def test_cli_bm25f_validation(snapshot):
    with pytest.raises(SystemExit):  # bm25f needs the title index
        _cli().main(["--index", str(snapshot / "ix"), "--mode", "bm25f",
                     "--query", "fast"])
    with pytest.raises(SystemExit):  # title index silently ignored = bug
        _cli().main(["--index", str(snapshot / "ix"), "--mode", "bm25",
                     "--title-index", str(snapshot / "ix"),
                     "--query", "fast"])


def test_build_cli_analyzer_flags(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    src = tmp_path / "corpus"
    src.mkdir()
    (src / "a.txt").write_text("The Ponies of Café X", encoding="utf-8")
    repo = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "build_index_submit", repo / "scripts" / "build_index_submit.py")
    bcli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bcli)
    bcli.main(["--input", str(src), "--input-format", "files",
               "--glob", "*.txt", "--output", str(tmp_path / "ix"),
               "--shards", "2", "--skip-segments",
               "--stopwords", "the,of,a", "--fold-accents",
               "--stem", "light"])
    capsys.readouterr()
    from textindexing_spark import Index
    ix = Index.load(spark, str(tmp_path / "ix"))
    assert {r["term"] for r in ix.postings.collect()} == \
        {"pony", "cafe", "x"}


def test_cli_flag_validation(snapshot):
    cli = _cli()
    with pytest.raises(SystemExit):
        cli.main(["--index", str(snapshot / "ix"), "--query", "x",
                  "--mode", "bool", "--after", "1.0:3"])
    with pytest.raises(SystemExit):  # cursor belongs to ONE ranking
        cli.main(["--index", str(snapshot / "ix"), "--query", "x",
                  "--query", "y", "--mode", "bm25", "--after", "1.0:3"])
    with pytest.raises(SystemExit):  # synonyms emit expr-language text
        cli.main(["--index", str(snapshot / "ix"), "--query", "x",
                  "--mode", "bool", "--synonyms", '{"x": ["y"]}'])
    with pytest.raises(SystemExit):  # facet semantics = expr semantics
        cli.main(["--index", str(snapshot / "ix"), "--query", "x",
                  "--mode", "bm25", "--facet", "lang",
                  "--facet-table", "/tmp/nope"])
    with pytest.raises(SystemExit):
        cli.main(["--index", str(snapshot / "ix"), "--query", "x",
                  "--mode", "expr", "--facet", "lang"])
    # explain must not silently explain a DIFFERENT (unfiltered /
    # page-1) ranking than the bm25 mode returned for the same flags
    with pytest.raises(SystemExit):
        cli.main(["--index", str(snapshot / "ix"), "--query", "x",
                  "--mode", "explain", "--filter-expr", "y"])
    with pytest.raises(SystemExit):
        cli.main(["--index", str(snapshot / "ix"), "--query", "x",
                  "--mode", "explain", "--after", "1.0:3"])


def test_cli_shard_plan(spark, snapshot, tmp_path, capsys, monkeypatch):
    """--shard-plan on a segments index narrates the rare-term pruning
    decision per query; it is segments-tier-only and bm25-only."""
    from textindexing_spark.operators.bm25 import build_segments_from_docs

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rows = [(i, f"common{i % 3} filler") for i in range(60)] + [
        (9001, "zzneedle common0")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    build_segments_from_docs(
        spark, docs, IndexConfig(block_size=16),
        n_shards=8).save(str(tmp_path / "seg"))

    cli = _cli()
    cli.main(["--index", str(tmp_path / "seg"), "--mode", "bm25",
              "--query", "zzneedle", "--shard-plan", "--k", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["results"][0][0] == 9001
    plan = out["shard_plan"]
    assert plan["n_shards"] == 8 and plan["n_scheduled"] == 1
    assert plan["terms"] == {"zzneedle": 1}
    assert plan["candidate_shards"] is not None

    with pytest.raises(SystemExit):  # segments-tier concept
        cli.main(["--index", str(snapshot / "ix"), "--query", "x",
                  "--mode", "bm25", "--shard-plan"])
    with pytest.raises(SystemExit):  # bm25-only
        cli.main(["--index", str(tmp_path / "seg"), "--query", "x",
                  "--mode", "phrase", "--shard-plan"])


def test_cli_mlt_mode(spark, snapshot, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    _cli().main([
        "--index", str(snapshot / "ix"), "--mode", "mlt",
        "--query", CORPUS[0][1], "--exclude-doc", "0", "--k", "3",
        "--mlt-min-df", "1", "--mlt-max-df-ratio", "1.0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ids = [d for d, _ in out["results"]]
    assert 0 not in ids
    # doc 4 shares 'fast' (the example's rarest = highest-weighted term)
    # plus 'merge' and 'scan', so it outranks the merge-scan-only docs
    assert ids[0] == 4
    assert all(isinstance(s, float) for _, s in out["results"])


def test_cli_fuzzy_expr_mode(spark, snapshot, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    _cli().main([
        "--index", str(snapshot / "ix"), "--mode", "expr",
        "--query", "fst~1 AND merge"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["results"] == [0, 4]  # fst~1 -> fast


def test_cli_mlt_validation(snapshot):
    cli = _cli()
    with pytest.raises(SystemExit):  # exclude-doc is mlt-only
        cli.main(["--index", str(snapshot / "ix"), "--query", "x",
                  "--mode", "bool", "--exclude-doc", "1"])
    with pytest.raises(SystemExit):  # analyzer flags never rewrite mlt text
        cli.main(["--index", str(snapshot / "ix"), "--query", "x",
                  "--mode", "mlt", "--stem", "light"])


def test_cli_complete_mode(spark, snapshot, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    _cli().main([
        "--index", str(snapshot / "ix"), "--mode", "complete",
        "--query", "s", "--k", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # scan (df 5) outranks slow (df 1)
    assert out["results"] == [["scan", 5], ["slow", 1]]


def test_cli_explain_mode(spark, snapshot, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    _cli().main([
        "--index", str(snapshot / "ix"), "--mode", "explain",
        "--query", "fast merge", "--k", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # k caps DOCS; rows are per (doc, matched term), all of them emitted
    rows = out["results"]
    assert {r[0] for r in rows} <= {0, 1, 2, 3, 4}
    assert len({r[0] for r in rows}) == 2
    assert out["n_results"] == len(rows)
    for doc_id, score, term, tf, df, doc_len, idf, contrib in rows:
        assert term in ("fast", "merge")
        assert tf >= 1 and df >= 1 and doc_len >= 3
        assert contrib <= score + 1e-9
    # contributions (display-rounded) sum back to the doc score
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r[0], [0.0, r[1]])[0] += r[7]
    for total, score in by_doc.values():
        assert total == pytest.approx(score, abs=2e-4)
    # doc 4 has tf(fast)=2 — the breakdown must surface it
    fast4 = [r for r in rows if r[0] == 4 and r[2] == "fast"]
    assert fast4 and fast4[0][3] == 2
