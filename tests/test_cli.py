"""CLI smoke tests through the real subcommand paths on tiny data."""
import json

import pytest

from semanticsearch_tpu.cli.main import main
from semanticsearch_tpu.data.tsv import write_tsv


@pytest.fixture()
def corpus(tmp_path):
    rows = [
        {"query_id": f"q{i % 2}", "query_text": f"query about topic {i % 2}",
         "document_id": f"d{i}",
         "document": " ".join(
             f"Sentence {s} of doc {i} about things and stuff." for s in range(6)
         ),
         "label": str(i % 2)}
        for i in range(4)
    ]
    p = tmp_path / "corpus.tsv"
    write_tsv(str(p), rows,
              ["query_id", "query_text", "document_id", "document", "label"])
    return str(p)


def test_cli_chunk_char(corpus, tmp_path, capsys):
    rc = main(["chunk", "-i", corpus, "-o", str(tmp_path / "out"),
               "--config", "text_splitter_char"])
    assert rc == 0
    blob = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert blob["chunks_out"] >= 4


def test_cli_validate_and_folds(tmp_path, capsys):
    p = tmp_path / "labeled.tsv"
    write_tsv(
        str(p),
        [{"query_id": f"q{i % 3}", "chunk_text": f"text {i}", "label": str(i % 2)}
         for i in range(12)],
        ["query_id", "chunk_text", "label"],
    )
    assert main(["validate", "-i", str(p)]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rows_kept"] == 12
    assert main(["folds", "-i", str(p), "-o", str(tmp_path / "cv"),
                 "--num-folds", "3"]) == 0
    folds = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(folds["folds"]) == 3


def test_cli_analyze(corpus, capsys):
    assert main(["analyze", "documents", "-i", corpus]) == 0
    blob = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert blob["word_count_stats"]["count"] == 4


def test_cli_train_tiny(tmp_path, capsys):
    import numpy as np

    rng = np.random.default_rng(0)
    rows = []
    for q in range(6):
        for d in range(4):
            lab = 1 if d < 2 else 0
            words = [f"tok{q}"] * 3 if lab else [f"z{rng.integers(100)}" for _ in range(3)]
            rows.append({"query_id": f"q{q}",
                         "query_text": f"tok{q} question",
                         "chunk_text": " ".join(words) + " filler words here",
                         "label": str(lab)})
    p = tmp_path / "labeled.tsv"
    write_tsv(str(p), rows, ["query_id", "chunk_text", "label"])
    # folds expect query_text column optional; train uses query_id as left text
    assert main(["folds", "-i", str(p), "-o", str(tmp_path / "cv"),
                 "--num-folds", "2"]) == 0
    capsys.readouterr()
    rc = main([
        "train", "--models", "knrm", "--folds-dir", str(tmp_path / "cv"),
        "--num-folds", "2",
        "--set", "train.epochs=1",
        "--set", "train.batch_size=2",
        "--set", "train.optimizer=adam",
        "--set", "train.learning_rate=0.01",
        "--set", "train.embedding_dim=8",
        "--set", "train.filter_low_freq=1",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "knrm" in out


def test_cli_train_then_evaluate_saved(tmp_path, capsys):
    """train --output-dir saves per-fold checkpoints; `evaluate` reloads
    them and reports mean±std without retraining (reference
    evaluate_models.py artifact-reload path)."""
    import numpy as np

    rng = np.random.default_rng(1)
    rows = []
    for q in range(6):
        for d in range(4):
            lab = 1 if d < 2 else 0
            words = [f"tok{q}"] * 3 if lab else [f"z{rng.integers(100)}" for _ in range(3)]
            rows.append({"query_id": f"q{q}",
                         "chunk_text": " ".join(words) + " filler words here",
                         "label": str(lab)})
    p = tmp_path / "labeled.tsv"
    write_tsv(str(p), rows, ["query_id", "chunk_text", "label"])
    assert main(["folds", "-i", str(p), "-o", str(tmp_path / "cv"),
                 "--num-folds", "2"]) == 0
    sets = ["--set", "train.epochs=1", "--set", "train.batch_size=2",
            "--set", "train.optimizer=adam", "--set", "train.learning_rate=0.01",
            "--set", "train.embedding_dim=8", "--set", "train.filter_low_freq=1"]
    assert main(["train", "--models", "knrm", "--folds-dir",
                 str(tmp_path / "cv"), "--num-folds", "2",
                 "--output-dir", str(tmp_path / "models")] + sets) == 0
    capsys.readouterr()
    rc = main(["evaluate", "--model-dirs", str(tmp_path / "models" / "knrm"),
               "--folds-dir", str(tmp_path / "cv"), "--num-folds", "2"])
    assert rc == 0
    import json as _json

    out = _json.loads(capsys.readouterr().out)
    assert "knrm" in out and "map" in out["knrm"]
    assert 0.0 <= out["knrm"]["map"]["mean"] <= 1.0

    # missing model dir -> empty result, nonzero exit
    capsys.readouterr()
    assert main(["evaluate", "--model-dirs", str(tmp_path / "nope"),
                 "--folds-dir", str(tmp_path / "cv")]) == 1


def test_cli_index_add_and_search(tmp_path, capsys):
    """index --bm25 -> index-add (incremental embed + compact) -> search
    finds the added chunk through both retrieval legs."""
    chunks = tmp_path / "chunks.tsv"
    write_tsv(
        str(chunks),
        [{"chunk_id": f"c{i}", "chunk_text": t}
         for i, t in enumerate([
             "solar panels convert sunlight into electricity",
             "the fishing quota for trawlers was reduced",
         ])],
        ["chunk_id", "chunk_text"],
    )
    idx = str(tmp_path / "idx")
    assert main(["index", "-i", str(chunks), "-o", idx, "--bm25"]) == 0
    capsys.readouterr()

    add = tmp_path / "add.tsv"
    write_tsv(str(add),
              [{"chunk_id": "cNEW",
                "chunk_text": "glacier meltwater feeds mountain lake"}],
              ["chunk_id", "chunk_text"])
    assert main(["index-add", "-i", str(add), "--index-dir", idx]) == 0
    blob = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert blob == {"rows_before": 2, "rows_added": 1, "rows_total": 3}

    assert main(["search", "--index-dir", idx, "-k", "2",
                 "glacier meltwater mountain"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    top = out[0]["hits"][0]
    assert top["chunk_id"] == "cNEW"
    assert top["lexical_rank"] == 1 and top["dense_rank"] == 1


def test_cli_tune_fusion_saves_and_serves(tmp_path, capsys):
    """tune-fusion grid-searches alpha on a labeled TSV, --save persists
    it, and a following search auto-applies the persisted value."""
    import os

    chunks = tmp_path / "chunks.tsv"
    write_tsv(
        str(chunks),
        [{"chunk_id": f"c{i}", "chunk_text": t}
         for i, t in enumerate([
             "solar panels convert sunlight into electricity",
             "the fishing quota for trawlers was reduced",
             "bees pollinate flowers and produce honey",
         ])],
        ["chunk_id", "chunk_text"],
    )
    idx = str(tmp_path / "idx")
    assert main(["index", "-i", str(chunks), "-o", idx, "--bm25"]) == 0
    capsys.readouterr()

    val = tmp_path / "val.tsv"
    write_tsv(
        str(val),
        [{"query_id": "q0", "query_text": "fishing quota trawlers",
          "chunk_id": "c1", "label": "1"},
         {"query_id": "q1", "query_text": "bees honey",
          "chunk_id": "c2", "label": "1"},
         {"query_id": "q1", "query_text": "bees honey",
          "chunk_id": "c0", "label": "0"}],
        ["query_id", "query_text", "chunk_id", "label"],
    )
    assert main(["tune-fusion", "--index-dir", idx, "-i", str(val),
                 "--save"]) == 0
    blob = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= blob["best_alpha"] <= 1.0
    assert blob["queries"] == 2
    assert os.path.exists(os.path.join(idx, "fusion.json"))

    assert main(["search", "--index-dir", idx, "-k", "2",
                 "fishing quota trawlers"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out[0]["hits"][0]["chunk_id"] == "c1"


def test_cli_train_encoder_with_mining(tmp_path, capsys):
    rows = []
    for t in range(2):
        for i in range(6):
            rows.append({"query_id": f"q{t}",
                         "query_text": f"query topic{t} find",
                         "chunk_text": f"chunk{t} item{i} alpha beta",
                         "label": "1"})
            rows.append({"query_id": f"q{t}",
                         "query_text": f"query topic{t} find",
                         "chunk_text": f"offtopic{1 - t} item{i} gamma",
                         "label": "0"})
    p = tmp_path / "labeled.tsv"
    write_tsv(str(p), rows, ["query_id", "query_text", "chunk_text", "label"])
    rc = main(["train-encoder", "-i", str(p), "-o", str(tmp_path / "ckpt"),
               "--epochs", "2", "--mine-rounds", "2", "--batch-size", "8",
               "--set", "encoder.vocab_size=512",
               "--set", "encoder.hidden_dim=32",
               "--set", "encoder.num_layers=1",
               "--set", "encoder.num_heads=2",
               "--set", "encoder.mlp_dim=64",
               "--set", "encoder.max_len=16"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mine_rounds"] == 2
    assert out["epochs"] == 2  # 2 rounds x 1 epoch each
    assert out["pairs"] == 12
    import numpy as np

    from semanticsearch_tpu.train.encoder_train import load_encoder

    enc = load_encoder(str(tmp_path / "ckpt"))
    assert np.isfinite(enc.encode(["query topic0 find"])).all()


def test_cli_tune_fusion_rerank_top_requires_reranker(tmp_path, capsys):
    chunks = tmp_path / "chunks.tsv"
    write_tsv(
        str(chunks),
        [{"chunk_id": "c0", "chunk_text": "alpha beta gamma"},
         {"chunk_id": "c1", "chunk_text": "delta epsilon zeta"}],
        ["chunk_id", "chunk_text"],
    )
    idx = str(tmp_path / "idx")
    assert main(["index", "-i", str(chunks), "-o", idx, "--bm25"]) == 0
    val = tmp_path / "val.tsv"
    write_tsv(str(val),
              [{"query_id": "q0", "query_text": "alpha beta",
                "chunk_id": "c0", "label": "1"}],
              ["query_id", "query_text", "chunk_id", "label"])
    capsys.readouterr()
    rc = main(["tune-fusion", "--index-dir", idx, "-i", str(val),
               "--rerank-top", "4"])
    assert rc == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "--reranker" in out["error"]


def test_cli_oie_train_then_neural_enrich(tmp_path, capsys):
    """oie-train bootstraps a tiny tagger; `oie --extractor neural` enriches
    through the batched path with the saved checkpoint."""
    p = tmp_path / "chunks.tsv"
    rows = [
        {"chunk_id": f"c{i}",
         "chunk_text": f"The old engineer carried the bridge number {i}."}
        for i in range(24)
    ]
    write_tsv(str(p), rows, ["chunk_id", "chunk_text"])
    model_dir = str(tmp_path / "oie_model")
    rc = main(["oie-train", "-i", str(p), "-o", model_dir,
               "--epochs", "6", "--hidden-dim", "32", "--num-layers", "1",
               "--num-heads", "2", "--bpe-vocab", "128"])
    assert rc == 0
    blob = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert blob["model_dir"] == model_dir and blob["texts"] == 24

    out = tmp_path / "enriched.tsv"
    rc = main(["oie", "-i", str(p), "-o", str(out),
               "--extractor", "neural", "--model-dir", model_dir])
    assert rc == 0
    blob = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert blob["enriched_rows"] == 24
    from semanticsearch_tpu.data.tsv import read_tsv

    got = list(read_tsv(str(out)))
    assert "raw_oie_data" in got[0]
