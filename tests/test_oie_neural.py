"""Neural OIE tagger: silver-label alignment, BIO decode, learnability,
persistence, and the batched enrich path (oie/neural.py)."""
import numpy as np
import pytest

from semanticsearch_tpu.oie.heuristic import _clause_triple, _tokens
from semanticsearch_tpu.oie.neural import (
    BIO_TAGS,
    NeuralOIE,
    NeuralOIEConfig,
    decode_bio,
    silver_bio_tags,
    silver_spans,
)

SENTENCES = [
    "The ancient aqueduct carried water to the Roman city.",
    "The fishing quota for trawlers was reduced this season.",
    "Solar panels convert sunlight into electricity.",
    "The committee approved the new budget on Tuesday.",
]


def _tiny_cfg(**over):
    base = dict(hidden_dim=32, num_layers=1, num_heads=2, mlp_dim=64,
                max_len=48, max_words=24, vocab_size=512, epochs=12,
                batch_size=32, seed=0)
    base.update(over)
    return NeuralOIEConfig(**base)


def _silver_corpus(n=160, seed=0):
    rng = np.random.default_rng(seed)
    adjs = ["old", "young", "tired", "famous", "local", "senior"]
    subs = ["engineer", "farmer", "pilot", "teacher", "mayor", "doctor"]
    verbs = ["carried", "approved", "built", "painted", "visited",
             "repaired", "signed", "planted"]
    objs = ["bridge", "budget", "house", "letter", "garden", "engine",
            "contract", "orchard"]
    return [
        f"The {rng.choice(adjs)} {rng.choice(subs)} {rng.choice(verbs)} "
        f"the {rng.choice(objs)}."
        for _ in range(n)
    ]


# --------------------------------------------------------- silver alignment

def test_silver_spans_match_heuristic_triples():
    """Span-joined strings must equal _clause_triple's fields exactly —
    the alignment the BIO labels depend on."""
    for sentence in SENTENCES:
        words = _tokens(sentence)
        triple = _clause_triple(words)
        spans = silver_spans(words)
        assert (triple is None) == (spans is None), sentence
        if triple is None:
            continue
        (sa, sb), (ra, rb), (oa, ob) = spans
        assert " ".join(words[sa:sb]) == triple["subject"]
        assert " ".join(words[ra:rb]) == triple["relation"]
        assert " ".join(words[oa:ob]) == triple["object"]


def test_silver_spans_none_cases():
    assert silver_spans(["short", "one"]) is None         # < 3 tokens
    assert silver_spans(["it", "ran", "fast"]) is None    # pronoun subject
    assert silver_spans(["blue", "cold", "green"]) is None  # no verb group


def test_decode_bio_roundtrip():
    """silver tags -> decode_bio reproduces the heuristic triple."""
    for sentence in SENTENCES:
        words = _tokens(sentence)
        triple = _clause_triple(words)
        tags = silver_bio_tags(words)
        if triple is None:
            assert tags is None
            continue
        decoded = decode_bio(words, tags)
        assert decoded == [triple], sentence


def test_decode_bio_multi_triple_and_garbage():
    # two complete triples back to back
    words = ["cats", "chase", "mice", "dogs", "chase", "cats"]
    tags = [BIO_TAGS.index(t) for t in
            ["B-SUBJ", "B-REL", "B-OBJ", "B-SUBJ", "B-REL", "B-OBJ"]]
    assert decode_bio(words, tags) == [
        {"subject": "cats", "relation": "chase", "object": "mice"},
        {"subject": "dogs", "relation": "chase", "object": "cats"},
    ]
    # incomplete role set -> no triple, never a crash
    tags = [BIO_TAGS.index(t) for t in
            ["B-SUBJ", "I-SUBJ", "O", "O", "O", "O"]]
    assert decode_bio(words, tags) == []
    # all-O
    assert decode_bio(words, [0] * 6) == []


# ------------------------------------------------------------- learnability

def test_neural_oie_learns_silver_and_contract(tmp_path):
    """Tiny tagger bootstrapped from the heuristic teacher agrees with it
    on held-out same-distribution sentences, and never invents tokens."""
    from semanticsearch_tpu.oie.heuristic import extract_triples_heuristic
    from semanticsearch_tpu.oie.neural import train_neural_oie

    corpus = _silver_corpus(160, seed=0)
    held_out = _silver_corpus(24, seed=99)
    oie = train_neural_oie(corpus, cfg=_tiny_cfg(),
                           save_dir=str(tmp_path / "oie_ckpt"),
                           bpe_vocab_size=256)
    got = oie.extract(held_out)
    agree = 0
    for text, triples in zip(held_out, got):
        # contract: every emitted word appears in the sentence
        words = set(_tokens(text))
        for t in triples:
            for field in ("subject", "relation", "object"):
                assert set(t[field].split()) <= words, (text, t)
        teacher = extract_triples_heuristic(text)
        if teacher and triples and triples[0] == teacher[0]:
            agree += 1
    assert agree >= 0.7 * len(held_out), f"agreement {agree}/{len(held_out)}"

    # persistence: reloaded model extracts identically
    again = NeuralOIE.load(str(tmp_path / "oie_ckpt"))
    assert again.extract(held_out) == got


def test_neural_oie_mesh_sharded_matches_single_device():
    """Extraction under a data-sharded mesh is bit-identical to the
    single-device path (params replicated, batch rows sharded)."""
    import jax

    from semanticsearch_tpu.core.mesh import MeshSpec, make_mesh

    corpus = _silver_corpus(64, seed=3)
    oie = NeuralOIE(_tiny_cfg(epochs=2))  # hash tokenizer fallback
    oie.fit_silver(corpus)
    held_out = _silver_corpus(16, seed=42)
    base = oie.extract(held_out, batch_size=8)

    n = min(8, len(jax.devices()))
    mesh = make_mesh(MeshSpec(data=n, model=1))
    sharded = NeuralOIE(oie.cfg, tokenizer=None, params=oie.params,
                        mesh=mesh)
    assert sharded.extract(held_out, batch_size=8) == base


def test_enrich_tsv_neural_extractor(tmp_path):
    """extractor='neural' fills the OIE columns through the batched path."""
    from semanticsearch_tpu.data.tsv import read_tsv, write_tsv
    from semanticsearch_tpu.oie.client import enrich_chunk_tsv
    from semanticsearch_tpu.oie.neural import train_neural_oie

    corpus = _silver_corpus(120, seed=1)
    model_dir = str(tmp_path / "oie_model")
    train_neural_oie(corpus, cfg=_tiny_cfg(epochs=10), save_dir=model_dir,
                     bpe_vocab_size=256)
    rows = [
        {"chunk_id": "c0",
         "chunk_text": "The old engineer carried the bridge."},
        {"chunk_id": "c1", "chunk_text": ""},
    ]
    src, out = tmp_path / "chunks.tsv", tmp_path / "enriched.tsv"
    write_tsv(str(src), rows, ["chunk_id", "chunk_text"])
    n = enrich_chunk_tsv(str(src), str(out), extractor="neural",
                         model_dir=model_dir, batch_size=2)
    assert n == 2
    got = list(read_tsv(str(out)))
    assert "carried" in got[0]["raw_oie_data"]
    assert got[1]["raw_oie_data"] == ""
    # neural without a model dir is a loud error, not a silent fallback
    with pytest.raises(ValueError, match="model_dir"):
        enrich_chunk_tsv(str(src), str(out), extractor="neural")


# -------------------------------------------------- domain-shift self-check

def test_teacher_agreement_in_domain(tmp_path):
    """A tagger fit on its serving corpus scores high teacher agreement on
    that corpus (the in-domain contract, VERDICT-r4 weak 3)."""
    from semanticsearch_tpu.oie.neural import train_neural_oie

    corpus = _silver_corpus(160, seed=0)
    oie = train_neural_oie(corpus, cfg=_tiny_cfg(), bpe_vocab_size=256)
    rep = oie.teacher_agreement(_silver_corpus(32, seed=7))
    assert rep["n_teacher_sentences"] > 0
    assert rep["agreement"] >= 0.7, rep
    # empty input: no signal, vacuously fine
    assert oie.teacher_agreement([])["n_teacher_sentences"] == 0


def test_enrich_self_check_gate(tmp_path, monkeypatch, caplog):
    """The enforced in-domain contract: below the agreement floor the
    enrich run warns, falls back to the heuristic, or aborts — never
    silently emits near-empty triples (cross-domain F1 0.171)."""
    import logging

    from semanticsearch_tpu.data.tsv import read_tsv, write_tsv
    from semanticsearch_tpu.oie.client import enrich_chunk_tsv
    from semanticsearch_tpu.oie.neural import NeuralOIE, train_neural_oie

    corpus = _silver_corpus(120, seed=1)
    model_dir = str(tmp_path / "oie_model")
    train_neural_oie(corpus, cfg=_tiny_cfg(epochs=2), save_dir=model_dir,
                     bpe_vocab_size=256)
    rows = [{"chunk_id": "c0",
             "chunk_text": "The old engineer carried the bridge."}]
    src, out = tmp_path / "chunks.tsv", tmp_path / "enriched.tsv"
    write_tsv(str(src), rows, ["chunk_id", "chunk_text"])

    # force the off-domain verdict deterministically
    monkeypatch.setattr(
        NeuralOIE, "teacher_agreement",
        lambda self, texts, sample=64, seed=0: {
            "agreement": 0.1, "n_teacher_sentences": 20, "n_sampled": 40})

    # the package logger does not propagate to root (core/logging.py:28);
    # attach caplog's handler to it directly for this test
    pkg_logger = logging.getLogger("semsearch")
    pkg_logger.addHandler(caplog.handler)
    try:
        _run_gate_cases(src, out, model_dir, caplog)
    finally:
        pkg_logger.removeHandler(caplog.handler)


def _run_gate_cases(src, out, model_dir, caplog):
    import logging

    import pytest

    from semanticsearch_tpu.data.tsv import read_tsv
    from semanticsearch_tpu.oie.client import enrich_chunk_tsv

    with pytest.raises(RuntimeError, match="teacher-agreement"):
        enrich_chunk_tsv(str(src), str(out), extractor="neural",
                         model_dir=model_dir, on_low_agreement="error")

    # fallback: the run completes on the HEURISTIC engine (exact triples)
    with caplog.at_level(logging.WARNING):
        n = enrich_chunk_tsv(str(src), str(out), extractor="neural",
                             model_dir=model_dir,
                             on_low_agreement="fallback")
    assert n == 1
    assert any("OFF-DOMAIN" in r.message for r in caplog.records)
    got = list(read_tsv(str(out)))
    assert "engineer" in got[0]["raw_oie_data"]
    assert "carried" in got[0]["raw_oie_data"]

    # warn (default): proceeds on the tagger, loudly
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        n = enrich_chunk_tsv(str(src), str(out), extractor="neural",
                             model_dir=model_dir)
    assert n == 1
    assert any("OFF-DOMAIN" in r.message for r in caplog.records)

    # self_check=0 disables the probe entirely
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        enrich_chunk_tsv(str(src), str(out), extractor="neural",
                         model_dir=model_dir, self_check=0.0)
    assert not any("OFF-DOMAIN" in r.message for r in caplog.records)
