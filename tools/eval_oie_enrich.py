"""OIE enrichment A/B: does `raw_oie_data_plus_chunk_text` move retrieval?

VERDICT-r3 item 4a. The reference's whole OIE pipeline exists to enrich
chunks for ranking (``Tool/OIE.py:285-390`` adds the
``raw_oie_data_plus_chunk_text`` column) but never measures the effect.
This measures it: retrieval MAP/nDCG@10 with chunks represented as plain
``chunk_text`` vs triples+text, for BOTH in-repo engines (heuristic and
neural), on a template-English corpus where extraction actually fires.

Corpus: per topic, a (subject, verb, object) fact; relevant docs state the
fact across a few sentences buried in newswire filler; queries mention the
fact's subject+object. Distractor docs share surface vocabulary (same
subjects with other objects, same filler) so term-weighting matters.
Enrichment duplicates each sentence's SVO kernel ahead of the text, which
(a) raises the fact terms' BM25 term frequency relative to filler and
(b) front-loads them inside the encoder's truncation window. Both effects
are what the reference's design bets on — here they get a number.

Protocol per representation (plain / heuristic / neural): BM25-only,
dense (encoder contrastively trained on THAT representation — the full
downstream effect, not just scoring), hybrid RRF. 3 seeds via --seed.

Usage: python tools/eval_oie_enrich.py --seed 0
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))

import argparse
import json
import time

import numpy as np

from eval_quality import ranking_metrics  # noqa: E402

ADJS = ["old", "young", "famous", "local", "senior", "retired", "modern",
        "rural", "coastal", "regional"]
SUBJECTS = ["engineer", "farmer", "pilot", "institute", "mayor", "guild",
            "council", "museum", "ministry", "academy", "union", "village",
            "workshop", "company", "port", "commission", "brigade",
            "cooperative", "observatory", "foundry", "library", "clinic",
            "brewery", "tribunal"]
VERBS = ["restored", "financed", "inspected", "mapped", "organized",
         "repaired", "painted", "delivered", "guarded", "surveyed",
         "modernized", "expanded"]
OBJECTS = ["granary", "bridge", "orchard", "harbor", "tunnel", "archive",
           "reservoir", "railway", "pavilion", "lighthouse", "aqueduct",
           "observat", "windmill", "cannery", "shipyard", "vineyard",
           "stadium", "monastery", "fortress", "terminal", "printworks",
           "bathhouse", "granite quarry", "tannery"]
FILL_SUBJ = ["the ministry", "local officials", "the provincial council",
             "industry delegates", "the state bank", "union delegates",
             "the planning office"]
FILL_OBJ = ["the annual report", "a revised schedule", "the budget draft",
            "new regulations", "the joint venture", "a training program",
            "the regional survey", "updated guidelines"]
FILL_VERB = ["reviewed", "discussed", "postponed", "announced", "examined",
             "considered", "published"]


def build_corpus(n_topics, seed, rel_per_topic=4, distractors_per_topic=3):
    """Topics = (subject, verb, object) facts; returns docs + labels."""
    rng = np.random.default_rng(seed)
    subs = rng.permutation(SUBJECTS)[:n_topics]
    objs = rng.permutation(OBJECTS)[:n_topics]
    verbs = [VERBS[i % len(VERBS)] for i in range(n_topics)]

    def filler_sentence():
        return (f"{rng.choice(FILL_SUBJ).capitalize()} "
                f"{rng.choice(FILL_VERB)} {rng.choice(FILL_OBJ)}.")

    def fact_sentence(t):
        return (f"The {rng.choice(ADJS)} {subs[t]} {verbs[t]} "
                f"the {objs[t]} {rng.choice(['last spring', 'in March', 'this year', 'before noon'])}.")

    docs, doc_topics = [], []
    for t in range(n_topics):
        for _ in range(rel_per_topic):
            n_fact = int(rng.integers(1, 3))
            n_fill = int(rng.integers(10, 22))
            sents = ([fact_sentence(t) for _ in range(n_fact)]
                     + [filler_sentence() for _ in range(n_fill)])
            rng.shuffle(sents)
            docs.append(" ".join(sents))
            doc_topics.append(t)
        # HARD distractors: contain every query term — subject, verb, AND
        # object — but scattered across unrelated sentences, never as the
        # fact. A bag-of-words scorer sees near-identical term sets; only
        # term FREQUENCY separates them once enrichment duplicates the
        # fact's SVO kernel, and only relation structure separates them
        # semantically.
        for _ in range(distractors_per_topic):
            n_fill = int(rng.integers(8, 18))
            sents = [
                f"The {rng.choice(ADJS)} {subs[t]} "
                f"{rng.choice(FILL_VERB)} {rng.choice(FILL_OBJ)}.",
                f"The {objs[t]} stood beyond the northern road.",
                f"{rng.choice(FILL_SUBJ).capitalize()} {verbs[t]} "
                f"{rng.choice(FILL_OBJ)}.",
            ] + [filler_sentence() for _ in range(n_fill)]
            rng.shuffle(sents)
            docs.append(" ".join(sents))
            doc_topics.append(-1 - t)  # relevant to nobody; topical trap for t
    queries = [f"{subs[t]} {verbs[t]} {objs[t]}" for t in range(n_topics)]
    # TRAIN-time query phrasings, disjoint surface forms from the eval
    # queries (the dense leg must not just memorize the eval string)
    train_queries = [
        [f"which {subs[t]} {verbs[t]} a {objs[t]}",
         f"the {objs[t]} that the {subs[t]} {verbs[t]}"]
        for t in range(n_topics)
    ]
    labels = np.zeros((n_topics, len(docs)), np.float32)
    for di, dt in enumerate(doc_topics):
        if dt >= 0:
            labels[dt, di] = 1.0
    return docs, queries, train_queries, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topics", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--encoder-epochs", type=int, default=8)
    ap.add_argument("--neural-epochs", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.index.bm25 import BM25Okapi, tokenize
    from semanticsearch_tpu.index.rrf import rrf_fuse
    from semanticsearch_tpu.models.encoder import SentenceEncoder
    from semanticsearch_tpu.models.subword import train_bpe
    from semanticsearch_tpu.oie.client import format_oie_triples_to_string
    from semanticsearch_tpu.oie.heuristic import extract_triples_heuristic
    from semanticsearch_tpu.train.encoder_train import (
        ContrastiveConfig, ContrastiveEncoderTrainer,
    )

    docs, queries, train_queries, labels = build_corpus(args.topics,
                                                        args.seed)
    nq, nd = labels.shape
    print(f"[corpus] {nd} docs / {nq} queries", file=sys.stderr)

    # train/eval query split: train on paraphrased forms, eval on the
    # canonical ones (queries are short; the encoder must learn the fact)
    rng = np.random.default_rng(args.seed + 5)

    # neural engine trained on THIS corpus's raw text (the oie-train
    # deployment recipe — silver labels from the heuristic, fit in-domain)
    t0 = time.perf_counter()
    from semanticsearch_tpu.oie.neural import NeuralOIEConfig, train_neural_oie

    oie_cfg = NeuralOIEConfig(hidden_dim=64, num_layers=2, num_heads=4,
                              mlp_dim=128, max_len=48, max_words=24,
                              vocab_size=1024, epochs=args.neural_epochs,
                              batch_size=32, seed=args.seed)
    neural = train_neural_oie(docs, cfg=oie_cfg, bpe_vocab_size=1024)
    print(f"[neural] trained ({time.perf_counter()-t0:.0f}s)",
          file=sys.stderr)

    def enrich(texts, extract):
        out = []
        for t in texts:
            triples = extract(t)
            formatted = format_oie_triples_to_string(triples)
            out.append((formatted + " " + t) if formatted else t)
        return out

    reps = {
        "plain_chunk_text": docs,
        "heuristic_plus_text": enrich(docs, extract_triples_heuristic),
        "neural_plus_text": enrich(docs, lambda t: neural.extract([t])[0]),
    }
    results = {}
    for name, rep_docs in reps.items():
        t0 = time.perf_counter()
        bm = BM25Okapi([tokenize(d) for d in rep_docs])
        bm_scores = np.stack([
            np.maximum(bm.get_scores(tokenize(q)), 0.0) for q in queries])
        row = {"bm25_only": ranking_metrics(bm_scores, labels)}

        tok = train_bpe(rep_docs + queries, vocab_size=2048, max_len=32)
        enc = SentenceEncoder(
            EncoderConfig(vocab_size=tok.vocab_size, hidden_dim=128,
                          num_layers=2, num_heads=4, mlp_dim=256,
                          max_len=96, dtype="float32"),
            seed=args.seed, tokenizer=tok)
        pairs, negs = [], []
        for qi in range(nq):
            rel = np.nonzero(labels[qi])[0]
            irr = np.nonzero(labels[qi] == 0)[0]
            for tq in train_queries[qi]:
                for di in rel:
                    pairs.append((tq, rep_docs[di]))
                    negs.append(rep_docs[rng.choice(irr)])
        ContrastiveEncoderTrainer(
            enc, ContrastiveConfig(epochs=args.encoder_epochs, batch_size=32,
                                   learning_rate=1e-3, max_len_query=16,
                                   max_len_chunk=96, seed=args.seed),
        ).fit(pairs, hard_negatives=negs)
        qe = enc.encode(queries)
        de = enc.encode(rep_docs)
        dense = qe @ de.T
        row["dense_trained"] = ranking_metrics(dense, labels)
        rrf = np.stack([rrf_fuse([dense[qi], bm_scores[qi]])
                        for qi in range(nq)])
        row["hybrid_rrf"] = ranking_metrics(rrf, labels)
        results[name] = row
        print(f"[{name}] bm25 {row['bm25_only']['map']:.4f} "
              f"dense {row['dense_trained']['map']:.4f} "
              f"rrf {row['hybrid_rrf']['map']:.4f} "
              f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)

    print(json.dumps({"metric": "oie_enrichment_ab", "seed": args.seed,
                      "topics": args.topics, "docs": nd,
                      "results": results}))


if __name__ == "__main__":
    main()
