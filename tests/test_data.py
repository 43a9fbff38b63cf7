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


def test_analyze_documents_distribution_and_per_row(tmp_path):
    """Reference parity: exact sentence-count distribution, 9-way buckets
    (analyze_document_lengths.py:171-215), per-row metrics TSV (:158-166)."""
    from semanticsearch_tpu.data.analyze import analyze_documents

    p = tmp_path / "corpus.tsv"
    write_tsv(
        str(p),
        [
            {"query_id": "q1", "query_text": "q", "document_id": "d1",
             "document": "One sentence here. And another one follows.",
             "label": "1"},
            {"query_id": "q1", "query_text": "q", "document_id": "d2",
             "document": "Short doc only here.", "label": "0"},
            {"query_id": "q2", "query_text": "q", "document_id": "d3",
             "document": "A. B. C. D. E. F. G.", "label": "1"},
        ],
        ["query_id", "query_text", "document_id", "document", "label"],
    )
    per_row = tmp_path / "per_row.tsv"
    rep = analyze_documents(str(p), per_row_output=str(per_row))
    dist = rep["sentence_count_distribution"]
    assert sum(dist.values()) == 3
    buckets = rep["sentence_count_buckets"]
    assert sum(buckets.values()) == 3
    assert set(buckets) == {"0", "1", "2", "3", "4-5", "6-10", "11-20",
                            "21-50", "51+"}
    lines = per_row.read_text().strip().split("\n")
    header = lines[0].split("\t")
    assert header[-3:] == ["word_count", "sentence_count",
                           "avg_words_per_sentence"]
    assert len(lines) == 4  # header + 3 rows
    first = lines[1].split("\t")
    assert first[-3] == "7"  # word count of d1


def test_analyze_chunks_examples_and_compare(tmp_path):
    """Reference parity: duplicate/longest examples + top tokens
    (analyze_chunks.py:94-125) and the multi-config compare ranking
    (analyze_chunks.py:127-142)."""
    from semanticsearch_tpu.data.analyze import (analyze_and_compare,
                                                 analyze_chunks,
                                                 compare_chunk_outputs)

    a = tmp_path / "a.tsv"
    write_tsv(
        str(a),
        [
            {"query_id": "q1", "document_id": "d1",
             "chunk_text": "alpha beta gamma delta epsilon"},
            {"query_id": "q1", "document_id": "d1", "chunk_text": "dup text"},
            {"query_id": "q1", "document_id": "d2", "chunk_text": "dup text"},
        ],
        ["query_id", "document_id", "chunk_text"],
    )
    b = tmp_path / "b.tsv"
    write_tsv(
        str(b),
        [{"query_id": "q1", "document_id": "d1", "chunk_text": "one two"}],
        ["query_id", "document_id", "chunk_text"],
    )
    rep = analyze_chunks(str(a))
    assert rep["documents"] == 2
    assert rep["duplicates_count"] == 1
    assert rep["top_duplicates_example"] == [["dup text", 2]]
    assert rep["top_longest_chunks"][0]["words"] == 5
    assert rep["top_longest_chunks"][0]["document_id"] == "d1"
    assert ("dup", 2) in rep["top_tokens"]
    assert rep["sentence_stats"]["count"] == 3

    both = analyze_and_compare([str(a), str(b)])
    ranked = both["comparison"]["ranking_by_avg_words"]
    assert [r["file"] for r in ranked] == [str(a), str(b)]
    assert ranked[0]["chunks"] == 3 and ranked[1]["chunks"] == 1
    # fewer than two files: no comparison (reference behavior)
    assert compare_chunk_outputs([rep]) == {}


def test_cli_analyze_multi_file(tmp_path):
    from semanticsearch_tpu.cli.main import main as cli_main

    a = tmp_path / "a.tsv"
    write_tsv(str(a), [{"query_id": "q", "document_id": "d",
                        "chunk_text": "x y z"}],
              ["query_id", "document_id", "chunk_text"])
    b = tmp_path / "b.tsv"
    write_tsv(str(b), [{"query_id": "q", "document_id": "d",
                        "chunk_text": "x"}],
              ["query_id", "document_id", "chunk_text"])
    out = tmp_path / "rep.json"
    rc = cli_main(["analyze", "chunks", "-i", str(a), str(b),
                   "-o", str(out)])
    assert rc == 0
    import json as _json

    rep = _json.loads(out.read_text())
    assert len(rep["files"]) == 2
    assert rep["comparison"]["ranking_by_avg_words"][0]["file"] == str(a)
