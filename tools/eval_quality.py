"""End-to-end retrieval QUALITY measurement: MAP / nDCG@10 per method.

Measures the quality half of BASELINE.md that kernel recall cannot show:
ranking quality of (1) BM25-only, (2) dense retrieval with a RANDOM encoder,
(3) dense retrieval with a CONTRASTIVELY TRAINED encoder, (4) hybrid
cosine+BM25 RRF fusion, (5) hybrid + trained neural reranker (MatchPyramid by default) — the full
reference pipeline shape (Tool/rank_chunks_optimized.py hybrid scoring +
MatchZoo_Tool reranking), on a corpus where quality is attributable:

- every topic has lexical-overlap relevant docs (BM25 can find these),
  paraphrase relevant docs whose vocabulary is DISJOINT from the query
  (only learned semantics can find these), and lexical-trap distractors
  that contain query words but belong to other topics (BM25 false hits);
- encoder + reranker train on a TRAIN query split, all metrics are on a
  held-out EVAL query split (new queries, new docs, same topics).

Prints one JSON line per method and writes a markdown table for BASELINE.md.

Usage: python tools/eval_quality.py [--output /tmp/quality] [--seed 0]
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


N_TOPICS = 16
FILLER = ("report describes several findings officials noted further review "
          "remains necessary according committee sources yesterday").split()


def _vocabs():
    qv = [[f"query{t}term{j}" for j in range(5)] for t in range(N_TOPICS)]
    dv = [[f"doc{t}word{j}" for j in range(8)] for t in range(N_TOPICS)]
    return qv, dv


def _text(rng, *word_pools, n=10):
    pool = [w for p in word_pools for w in p]
    return " ".join(rng.choice(pool, size=n))


def build_split(seed, n_queries_per_topic, qv, dv):
    """Queries + per-query relevant docs + shared distractors, with labels."""
    rng = np.random.default_rng(seed)
    queries, q_topics = [], []
    docs, doc_topics, doc_kind = [], [], []
    for t in range(N_TOPICS):
        for _ in range(n_queries_per_topic):
            queries.append(" ".join(rng.choice(qv[t], size=3)))
            q_topics.append(t)
        # relevant: 3 lexical (query vocab + doc vocab), 3 paraphrase-only
        for _ in range(3):
            docs.append(_text(rng, qv[t], dv[t], FILLER, n=12))
            doc_topics.append(t)
            doc_kind.append("lexical")
        for _ in range(3):
            docs.append(_text(rng, dv[t], FILLER, n=12))
            doc_topics.append(t)
            doc_kind.append("paraphrase")
        # lexical traps: contain THIS topic's query words but are about
        # another topic (relevant to nobody asking about topic t)
        for _ in range(3):
            other = (t + 1 + rng.integers(N_TOPICS - 1)) % N_TOPICS
            docs.append(_text(rng, qv[t][:2], dv[other], FILLER, n=12))
            doc_topics.append(-1)
            doc_kind.append("trap")
    return {
        "queries": queries, "q_topics": np.array(q_topics),
        "docs": docs, "doc_topics": np.array(doc_topics),
        "doc_kind": doc_kind,
    }


def relevance(split):
    """(n_queries, n_docs) binary labels: doc topic == query topic."""
    return (split["q_topics"][:, None] == split["doc_topics"][None, :]).astype(
        np.float32
    )


def ranking_metrics(scores, labels, metrics=("map", "ndcg@10", "p@10", "mrr")):
    from semanticsearch_tpu.train.metrics import eval_metric

    out = {m: [] for m in metrics}
    for qi in range(scores.shape[0]):
        for m in metrics:
            out[m].append(eval_metric(m, labels[qi], scores[qi]))
    return {m: float(np.mean(v)) for m, v in out.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="/tmp/semsearch_quality")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--reranker", default="match_pyramid")
    ap.add_argument("--reranker-epochs", type=int, default=4)
    ap.add_argument("--rerank-top", type=int, default=20)
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from semanticsearch_tpu.core.config import EncoderConfig, TrainConfig
    from semanticsearch_tpu.index.bm25 import BM25Okapi, tokenize
    from semanticsearch_tpu.index.rrf import ranks_from_scores
    from semanticsearch_tpu.models.encoder import SentenceEncoder
    from semanticsearch_tpu.train.encoder_train import (
        ContrastiveConfig, ContrastiveEncoderTrainer, save_encoder,
    )
    from semanticsearch_tpu.train.pairs import PairDataset
    from semanticsearch_tpu.train.trainer import RerankTrainer
    from semanticsearch_tpu.train.vocab import Preprocessor

    qv, dv = _vocabs()
    train = build_split(args.seed, n_queries_per_topic=4, qv=qv, dv=dv)
    evals = build_split(args.seed + 1000, n_queries_per_topic=2, qv=qv, dv=dv)
    labels = relevance(evals)
    nq, nd = labels.shape
    print(f"[corpus] train: {len(train['queries'])} queries / "
          f"{len(train['docs'])} docs; eval: {nq} queries / {nd} docs",
          file=sys.stderr)

    results = {}

    # ---------------------------------------------------------- 1. BM25 only
    doc_toks = [tokenize(d) for d in evals["docs"]]
    bm = BM25Okapi(doc_toks)
    t0 = time.perf_counter()
    bm25_scores = bm.get_scores_batch([tokenize(q) for q in evals["queries"]])
    results["bm25_only"] = ranking_metrics(bm25_scores, labels)
    print(f"[1/5] bm25: {results['bm25_only']} "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)

    # ------------------------------------------- 2. dense w/ RANDOM encoder
    enc_cfg = EncoderConfig(vocab_size=4096, hidden_dim=128, num_layers=2,
                            num_heads=4, mlp_dim=256, max_len=32,
                            dtype="float32")
    encoder = SentenceEncoder(enc_cfg, seed=args.seed)
    qe = encoder.encode(evals["queries"])
    de = encoder.encode(evals["docs"])
    results["dense_random_encoder"] = ranking_metrics(qe @ de.T, labels)
    print(f"[2/5] dense(random): {results['dense_random_encoder']}",
          file=sys.stderr)

    # ----------------------------------------- 3. dense w/ TRAINED encoder
    train_labels = relevance(train)
    pairs, negs = [], []
    rng = np.random.default_rng(args.seed)
    for qi, q in enumerate(train["queries"]):
        rel = np.nonzero(train_labels[qi])[0]
        irr = np.nonzero(train_labels[qi] == 0)[0]
        for di in rel:
            pairs.append((q, train["docs"][di]))
            negs.append(train["docs"][rng.choice(irr)])
    t0 = time.perf_counter()
    hist = ContrastiveEncoderTrainer(
        encoder,
        ContrastiveConfig(epochs=args.epochs, batch_size=64,
                          learning_rate=1e-3, max_len_query=16,
                          max_len_chunk=32, seed=args.seed),
    ).fit(pairs, hard_negatives=negs)
    print(f"[3/5] contrastive train: loss {hist[0]['loss']:.3f} -> "
          f"{hist[-1]['loss']:.3f} over {len(hist)} epochs "
          f"({time.perf_counter()-t0:.1f}s, {len(pairs)} pairs)",
          file=sys.stderr)
    save_encoder(encoder, os.path.join(args.output, "encoder_ckpt"))
    qe = encoder.encode(evals["queries"])
    de = encoder.encode(evals["docs"])
    dense_scores = qe @ de.T
    results["dense_trained_encoder"] = ranking_metrics(dense_scores, labels)
    print(f"[3/5] dense(trained): {results['dense_trained_encoder']}",
          file=sys.stderr)

    # --------------------------------------------------- 4. hybrid RRF fuse
    rrf_scores = np.zeros_like(dense_scores)
    for qi in range(nq):
        r_cos = ranks_from_scores(dense_scores[qi])
        r_bm = ranks_from_scores(bm25_scores[qi])
        rrf_scores[qi] = 1.0 / (60 + r_cos) + 1.0 / (60 + r_bm)
    results["hybrid_rrf"] = ranking_metrics(rrf_scores, labels)
    print(f"[4/5] hybrid rrf: {results['hybrid_rrf']}", file=sys.stderr)

    # ------------------------------------- 5. hybrid + trained KNRM rerank
    pp = Preprocessor(fixed_length_left=8, fixed_length_right=16,
                      filter_low_freq=1)
    pp.fit(list(train["queries"]) + list(train["docs"]))

    def make_ds(split, lab):
        lefts, rights, labs, qids = [], [], [], []
        for qi in range(len(split["queries"])):
            for di in range(len(split["docs"])):
                lefts.append(split["queries"][qi])
                rights.append(split["docs"][di])
                labs.append(lab[qi, di])
                qids.append(qi)
        enc2 = pp.transform_pair(lefts, rights)
        return PairDataset(left=enc2["left"], right=enc2["right"],
                           labels=np.asarray(labs, np.float32),
                           query_ids=np.asarray(qids))

    tr_cfg = TrainConfig(model=args.reranker, epochs=args.reranker_epochs, batch_size=32, num_neg=4,
                         optimizer="adam", learning_rate=0.01,
                         embedding_dim=64, filter_low_freq=1,
                         fixed_length_left=8, fixed_length_right=16)
    t0 = time.perf_counter()
    # subsample train ds for speed: per query, all rel + 12 random irr
    sub_rows = []
    for qi in range(len(train["queries"])):
        rel = np.nonzero(train_labels[qi])[0]
        irr = rng.choice(np.nonzero(train_labels[qi] == 0)[0], size=24,
                         replace=False)
        sub_rows.extend((qi, di) for di in list(rel) + list(irr))
    lefts = [train["queries"][qi] for qi, _ in sub_rows]
    rights = [train["docs"][di] for _, di in sub_rows]
    enc3 = pp.transform_pair(lefts, rights)
    train_ds = PairDataset(
        left=enc3["left"], right=enc3["right"],
        labels=np.asarray([train_labels[qi, di] for qi, di in sub_rows],
                          np.float32),
        query_ids=np.asarray([qi for qi, _ in sub_rows]),
    )
    reranker = RerankTrainer(args.reranker, vocab_size=pp.vocab_size,
                             cfg=tr_cfg)
    fit_res = reranker.fit(train_ds)
    eval_ds = make_ds(evals, labels)
    rerank_scores = reranker.predict(fit_res.params, eval_ds).reshape(nq, nd)
    # rerank the hybrid's top-20 candidates; below-cutoff docs keep their
    # RRF-ordered tail ranks (the reference reranks ranker output the same
    # shape: rank_chunks -> matchzoo rerank)
    top = args.rerank_top
    final_scores = np.full_like(rerank_scores, -np.inf)
    for qi in range(nq):
        cand = np.argsort(-rrf_scores[qi])[:top]
        final_scores[qi, cand] = rerank_scores[qi, cand]
        tail = np.argsort(-rrf_scores[qi])[top:]
        # keep tail ordered after the reranked head
        lo = rerank_scores[qi, cand].min()
        final_scores[qi, tail] = lo - 1.0 - np.arange(tail.size)
    results["hybrid_plus_reranker"] = ranking_metrics(final_scores, labels)
    print(f"[5/5] hybrid+reranker: {results['hybrid_plus_reranker']} "
          f"(train loss {fit_res.history[0]['loss']:.3f} -> "
          f"{fit_res.history[-1]['loss']:.3f}, "
          f"{time.perf_counter()-t0:.1f}s)", file=sys.stderr)

    # ------------------------------------------------------------- report
    md = ["| Method | MAP | nDCG@10 | P@10 | MRR |", "|---|---|---|---|---|"]
    for name, m in results.items():
        md.append(f"| {name} | {m['map']:.4f} | {m['ndcg@10']:.4f} "
                  f"| {m['p@10']:.4f} | {m['mrr']:.4f} |")
    table = "\n".join(md)
    with open(os.path.join(args.output, "quality.md"), "w") as f:
        f.write(table + "\n")
    print(table, file=sys.stderr)
    print(json.dumps({"metric": "quality_map_ndcg", "results": results,
                      "eval_queries": nq, "eval_docs": nd}))


if __name__ == "__main__":
    main()
