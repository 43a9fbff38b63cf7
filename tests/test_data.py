"""Data plumbing tests: integration, validation, folds, mapping, analyzers."""
import json
import os

import numpy as np
import pytest

from semanticsearch_tpu.data.analyze import analyze_chunks, analyze_documents
from semanticsearch_tpu.data.folds import create_cv_folds, load_fold_rows
from semanticsearch_tpu.data.integrate import integrate_corpus, parse_topics
from semanticsearch_tpu.data.mapping import add_query_text_to_tsv, build_query_map
from semanticsearch_tpu.data.tsv import read_tsv, standardize_header, write_tsv
from semanticsearch_tpu.data.validate import parse_label, validate_and_clean

TOPICS = """
<top>
<num> Number: 301
<title> International Organized Crime
<desc> Description:
Identify organizations that participate in international criminal activity.
<narr> Narrative:
A relevant document must name an organization.
</top>
<top>
<num> Number: 302
<desc> Description:
Poliomyelitis and post polio.
<narr> Narrative:
Is the disease under control?
</top>
"""


@pytest.fixture()
def corpus_dir(tmp_path):
    (tmp_path / "topics.txt").write_text(TOPICS)
    (tmp_path / "qrels.txt").write_text(
        "301 0 DOC1 1\n"
        "301 0 DOC2 0\n"
        "301 0 DOC1 1\n"      # duplicate pair
        "301 0 DOC3 0\n"      # same content as DOC2 -> content dedup
        "302 0 DOC1 1\n"
        "999 0 DOC1 1\n"      # no topic
        "301 0 MISSING 0\n"   # missing file
        "301 0 DOC4 0\n"      # "no information" doc
    )
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "DOC1").write_text("First document\twith a tab and  spaces.")
    (docs / "DOC2").write_text("Second document content here.")
    (docs / "DOC3").write_text("Second document content here.")
    (docs / "DOC4").write_text("This document has no information.")
    return tmp_path


def test_parse_topics():
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(TOPICS)
        path = f.name
    topics = parse_topics(path)
    assert set(topics) == {"301", "302"}
    assert topics["301"].startswith("Identify organizations")
    assert "A relevant document" in topics["301"]
    os.unlink(path)


def test_integrate_corpus(corpus_dir):
    out = corpus_dir / "integrated.tsv"
    stats = integrate_corpus(
        str(corpus_dir / "qrels.txt"),
        str(corpus_dir / "topics.txt"),
        str(corpus_dir / "docs"),
        str(out),
    )
    rows = list(read_tsv(str(out)))
    assert stats.written == 3  # 301/DOC1, 301/DOC2, 302/DOC1
    assert stats.skipped["dupe_pair"] == 1
    assert stats.skipped["dupe_content"] == 1
    assert stats.skipped["missing_topic"] == 1
    assert stats.skipped["file_missing"] == 1
    assert stats.skipped["no_info"] == 1
    assert all("\t" not in r["document"] for r in rows)
    assert rows[0]["label"] == "1"


def test_standardize_header_aliases():
    m = standardize_header(["qid", "passage", "score"])
    assert m == {"qid": "query_id", "passage": "chunk_text", "score": "label"}


def test_parse_label_token_sets():
    assert parse_label("1") == 1 and parse_label("pos") == 1
    assert parse_label("0") == 0 and parse_label("neg") == 0
    assert parse_label("-1.0") == 0 and parse_label("2.5") == 1
    assert parse_label("garbage") is None


def test_validate_and_clean(tmp_path):
    p = tmp_path / "in.tsv"
    write_tsv(
        str(p),
        [
            {"query_id": "q1", "chunk_text": "alpha", "label": "1"},
            {"query_id": "q1", "chunk_text": "beta", "label": "0"},
            {"query_id": "q2", "chunk_text": "gamma", "label": "1"},
            {"query_id": "q3", "chunk_text": "delta", "label": "bogus"},
            {"query_id": "q4", "chunk_text": "", "label": "1"},
        ],
        ["query_id", "chunk_text", "label"],
    )
    report = validate_and_clean(str(p), str(tmp_path / "out.tsv"))
    assert report.rows_kept == 3
    assert report.dropped["bad_label"] == 1
    assert report.dropped["empty_text"] == 1
    assert report.queries_pairable == 1  # only q1 has both labels
    assert report.queries_pos_only == 2  # q2 and q4(pos, empty text still counted in pass 1)
    blob = json.load(open(str(tmp_path / "out.tsv") + ".report.json"))
    assert blob["rows_kept"] == 3


def test_create_cv_folds(tmp_path):
    p = tmp_path / "labeled.tsv"
    rows = [
        {"query_id": f"q{i % 5}", "chunk_text": f"text {i}", "label": str(i % 2)}
        for i in range(50)
    ]
    write_tsv(str(p), rows, ["query_id", "chunk_text", "label"])
    folds = create_cv_folds(str(p), str(tmp_path / "cv"), num_folds=5, seed=42)
    assert len(folds) == 5
    test_sets = []
    for f in folds:
        tr = load_fold_rows(f.train)
        te = load_fold_rows(f.test)
        assert len(tr["labels"]) + len(te["labels"]) == 50
        test_sets.append(set(te["chunk_texts"]))
    # test folds partition the data
    all_test = set().union(*test_sets)
    assert len(all_test) == 50
    assert sum(len(s) for s in test_sets) == 50
    # determinism: same seed -> same split
    folds2 = create_cv_folds(str(p), str(tmp_path / "cv2"), num_folds=5, seed=42)
    assert load_fold_rows(folds2[0].test)["chunk_texts"] == \
        load_fold_rows(folds[0].test)["chunk_texts"]


def test_mapping_and_tab_repair(tmp_path):
    orig = tmp_path / "orig.tsv"
    write_tsv(
        str(orig),
        [{"query_id": "q1", "query_text": "what is alpha",
          "document_id": "d1", "document": "doc", "label": "1"}],
        ["query_id", "query_text", "document_id", "document", "label"],
    )
    chunks = tmp_path / "chunks.tsv"
    with open(chunks, "w") as f:
        f.write("query_id\tchunk_text\tlabel\n")
        f.write("q1\tnormal text\t1\n")
        f.write("q1\tbroken\ttext with tab\t0\n")  # needs repair
        f.write("q9\tno mapping\t1\n")
    out = add_query_text_to_tsv(str(chunks), str(orig))
    lines = open(out).read().strip().split("\n")
    assert lines[0] == "query_text\tchunk_text\tlabel"
    assert lines[1] == "what is alpha\tnormal text\t1"
    assert lines[2] == "what is alpha\tbroken text with tab\t0"
    assert len(lines) == 3  # q9 dropped


def test_analyzers(tmp_path):
    p = tmp_path / "corpus.tsv"
    write_tsv(
        str(p),
        [
            {"query_id": "q1", "query_text": "q", "document_id": "d1",
             "document": "One sentence here. And another one follows.", "label": "1"},
            {"query_id": "q1", "query_text": "q", "document_id": "d2",
             "document": "Short doc only here.", "label": "0"},
        ],
        ["query_id", "query_text", "document_id", "document", "label"],
    )
    rep = analyze_documents(str(p))
    assert rep["word_count_stats"]["count"] == 2
    assert rep["sentence_count_stats"]["max"] >= 1

    c = tmp_path / "chunks.tsv"
    write_tsv(
        str(c),
        [
            {"query_id": "q1", "document_id": "d1", "chunk_text": "alpha beta"},
            {"query_id": "q1", "document_id": "d1", "chunk_text": "alpha beta"},
            {"query_id": "q1", "document_id": "d2", "chunk_text": "gamma delta"},
        ],
        ["query_id", "document_id", "chunk_text"],
    )
    rep = analyze_chunks(str(c))
    assert rep["chunks"] == 3
    assert rep["duplicate_ratio"] == pytest.approx(1 / 3)
