"""End-to-end retrieval QUALITY measurement: MAP / nDCG@10 per method.

Measures the quality half of BASELINE.md that kernel recall cannot show:
ranking quality of (1) BM25-only, (2) dense retrieval with a RANDOM encoder,
(3) dense retrieval with a CONTRASTIVELY TRAINED encoder, (4) hybrid
cosine+BM25 RRF fusion, (5) hybrid + trained neural rerankers (any subset of
the 7 model families) — the full reference pipeline shape
(Tool/rank_chunks_optimized.py hybrid scoring + MatchZoo_Tool reranking,
evaluate_models.py:545-593), on a corpus where quality is attributable:

- every topic has lexical-overlap relevant docs (BM25 can find these),
  paraphrase relevant docs whose vocabulary is DISJOINT from the query
  (only learned semantics can find these), and lexical-trap distractors
  that contain query words but belong to other topics (BM25 false hits);
- topic words appear in MORPHOLOGICAL INFLECTIONS (stem/-s/-ed/-ing):
  eval queries use surface forms the training split never paired, so a
  subword tokenizer that decomposes them to known stems (--tokenizer
  subword, models/subword.py) is separable from the hashing tokenizer
  that sends each form to an unrelated bucket;
- encoder + rerankers train on a TRAIN query split, all metrics are on a
  held-out EVAL query split (new queries, new docs, same topics).

Prints one JSON line per run and writes a markdown table for BASELINE.md.

Usage:
  python tools/eval_quality.py                       # quick (16 topics)
  python tools/eval_quality.py --scale --rerankers all --tokenizer subword
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

FILLER = ("report describes several findings officials noted further review "
          "remains necessary according committee sources yesterday").split()

SUFFIXES = ["", "s", "ed", "ing"]

ALL_RERANKERS = ("knrm", "conv_knrm", "arcii", "match_pyramid", "esim",
                 "match_lstm", "mvlstm")


def _vocabs(n_topics):
    qv = [[f"query{t}term{j}" for j in range(5)] for t in range(n_topics)]
    dv = [[f"doc{t}word{j}" for j in range(8)] for t in range(n_topics)]
    return qv, dv


def _inflect(rng, words):
    """Sample surface forms: stem + one of -/-s/-ed/-ing per occurrence."""
    return [w + SUFFIXES[rng.integers(len(SUFFIXES))] for w in words]


def _text(rng, *word_pools, n=10):
    pool = [w for p in word_pools for w in p]
    return " ".join(_inflect(rng, list(rng.choice(pool, size=n))))


def build_split(seed, n_queries_per_topic, qv, dv, docs_per_class=3):
    """Queries + per-query relevant docs + shared distractors, with labels."""
    n_topics = len(qv)
    rng = np.random.default_rng(seed)
    queries, q_topics = [], []
    docs, doc_topics, doc_kind = [], [], []
    for t in range(n_topics):
        for _ in range(n_queries_per_topic):
            queries.append(
                " ".join(_inflect(rng, list(rng.choice(qv[t], size=3)))))
            q_topics.append(t)
        # relevant: lexical (query vocab + doc vocab) and paraphrase-only
        for _ in range(docs_per_class):
            docs.append(_text(rng, qv[t], dv[t], FILLER, n=12))
            doc_topics.append(t)
            doc_kind.append("lexical")
        for _ in range(docs_per_class):
            docs.append(_text(rng, dv[t], FILLER, n=12))
            doc_topics.append(t)
            doc_kind.append("paraphrase")
        # lexical traps: contain THIS topic's query words but are about
        # another topic (relevant to nobody asking about topic t)
        for _ in range(docs_per_class):
            other = (t + 1 + rng.integers(n_topics - 1)) % n_topics
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


def _blend_eval(gen_scores, pred_flat, top, betas, labels,
                metrics=("map", "ndcg@10")):
    """Rank-RRF blend of the reranker order with the generator order
    (``RankingConfig.rerank_blend`` semantics, index/query_engine.py):
    blended(d) = beta/(60+r_reranker) + (1-beta)/(60+r_generator) over each
    query's top-``top`` generator candidates, tail kept in generator order.
    ``pred_flat`` holds the reranker scores of those candidates concatenated
    in generator order. beta=1 reproduces the pure-rescoring row exactly
    (same ordering, reference ``evaluate_models.py:341-350`` semantics);
    beta=0 is the generator. Returns {beta: metrics} on ``labels``.
    """
    nq, nd = gen_scores.shape
    orders = [np.argsort(-gen_scores[qi]) for qi in range(nq)]
    out = {}
    for beta in betas:
        beta = float(beta)
        blend_scores = np.full((nq, nd), -np.inf, np.float32)
        off = 0
        for qi in range(nq):
            order = orders[qi]
            cand = order[:top]
            pred = np.asarray(pred_flat[off: off + cand.size], np.float64)
            off += cand.size
            rr_rank = np.empty(cand.size, np.int64)
            rr_rank[np.argsort(-pred, kind="stable")] = \
                np.arange(1, cand.size + 1)
            fus_rank = np.arange(1, cand.size + 1)
            blend_scores[qi, cand] = (
                beta / (60 + rr_rank) + (1 - beta) / (60 + fus_rank))
            tail = order[top:]
            lo = blend_scores[qi, cand].min()
            blend_scores[qi, tail] = lo - 1.0 - np.arange(tail.size)
        out[beta] = ranking_metrics(blend_scores, labels, metrics=metrics)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="/tmp/semsearch_quality")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--topics", type=int, default=16)
    ap.add_argument("--train-qpt", type=int, default=4,
                    help="train queries per topic")
    ap.add_argument("--eval-qpt", type=int, default=2,
                    help="eval queries per topic")
    ap.add_argument("--docs-per-class", type=int, default=3)
    ap.add_argument("--scale", action="store_true",
                    help="VERDICT-r2 scale: 200 topics, 500+ eval queries, "
                         "2000+ docs (sets topics/eval-qpt/docs-per-class)")
    ap.add_argument("--tokenizer", choices=["hash", "subword"],
                    default="hash")
    ap.add_argument("--vocab-size", type=int, default=4096,
                    help="embedding-table budget, SAME for both tokenizers")
    ap.add_argument("--rerankers", default="match_pyramid",
                    help="comma list, 'all', or 'none'")
    ap.add_argument("--reranker-epochs", type=int, default=4)
    ap.add_argument("--rerank-top", type=int, default=20)
    ap.add_argument("--reranker-vocab", choices=["word", "subword"],
                    default="word",
                    help="subword: rerankers encode pair texts as BPE "
                         "pieces of the --tokenizer subword vocabulary, so "
                         "unseen inflections decompose instead of hitting "
                         "UNK (requires --tokenizer subword)")
    ap.add_argument("--reranker-embed-init",
                    choices=["random", "encoder", "encoder_full"],
                    default="random",
                    help="encoder: init reranker embedding tables from the "
                         "TRAINED encoder's token table — the zero-egress "
                         "analog of the reference's GloVe-100 init "
                         "(train_controller.py:564-581); requires "
                         "--reranker-vocab subword. encoder_full: same, "
                         "plus the cross_encoder reranker warm-starts its "
                         "ENTIRE transformer stack from the trained "
                         "encoder (transfer_from_encoder) — the monoBERT "
                         "recipe, zero-egress")
    ap.add_argument("--reranker-distill", type=float, default=0.0,
                    help=">0: margin-MSE distillation weight w — reranker "
                         "loss becomes (1-w)*rank_loss + w*MSE(student "
                         "margin, scale*teacher margin), teacher = the "
                         "TRAINED dual encoder's cosine on each train row "
                         "(TrainConfig.distill_weight)")
    ap.add_argument("--reranker-distill-scale", type=float, default=1.0,
                    help="scale applied to teacher margins before the MSE "
                         "(cosine margins are ~0.1-0.5; hinge-trained "
                         "student scores live on a ~1.0 margin scale)")
    ap.add_argument("--reranker-keep-best", action="store_true",
                    help="carve 1 train query/topic into a validation "
                         "split; keep each reranker's best-val-MAP epoch "
                         "(TrainConfig.keep_best) instead of the last")
    ap.add_argument("--reranker-patience", type=int, default=2)
    ap.add_argument("--mine-rounds", type=int, default=1,
                    help=">1: split the contrastive epochs into this many "
                         "stages, re-mining each pair's hard negative from "
                         "the CURRENT encoder between stages (ANCE-style "
                         "self-mining, train/encoder_train.py)")
    ap.add_argument("--mlm-epochs", type=int, default=0,
                    help="unsupervised MLM pretraining epochs on the TRAIN "
                         "docs before contrastive training "
                         "(train/mlm_pretrain.py)")
    ap.add_argument("--load-encoder", default=None, metavar="CKPT_DIR",
                    help="reuse a TRAINED encoder checkpoint (from a prior "
                         "run's <output>/encoder_ckpt) instead of re-running "
                         "MLM/contrastive training — the encoder recipe is "
                         "deterministic in (seed, corpus), so probes that "
                         "vary only reranker settings can share one; the "
                         "checkpoint carries the subword tokenizer, which "
                         "then replaces the corpus-fit one")
    ap.add_argument("--rerank-candidates", choices=["rrf", "wrrf"],
                    default="rrf",
                    help="candidate generator the rerankers rescore: the "
                         "reference's unweighted RRF (parity) or the "
                         "train-tuned weighted fusion (train/fusion.py)")
    args = ap.parse_args()
    if args.reranker_vocab == "subword" and args.tokenizer != "subword":
        ap.error("--reranker-vocab subword requires --tokenizer subword")
    if (args.reranker_embed_init in ("encoder", "encoder_full")
            and args.reranker_vocab != "subword"):
        ap.error("--reranker-embed-init encoder[_full] requires "
                 "--reranker-vocab subword (the id spaces must match the "
                 "encoder's)")
    if args.reranker_keep_best and args.train_qpt < 2:
        ap.error("--reranker-keep-best needs --train-qpt >= 2 (one train "
                 "query per topic is carved into the validation split)")
    if args.scale:
        args.topics = max(args.topics, 200)
        args.eval_qpt = max(args.eval_qpt, 3)
        args.docs_per_class = max(args.docs_per_class, 4)
        args.epochs = min(args.epochs, 10)
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

    qv, dv = _vocabs(args.topics)
    train = build_split(args.seed, n_queries_per_topic=args.train_qpt,
                        qv=qv, dv=dv, docs_per_class=args.docs_per_class)
    evals = build_split(args.seed + 1000, n_queries_per_topic=args.eval_qpt,
                        qv=qv, dv=dv, docs_per_class=args.docs_per_class)
    labels = relevance(evals)
    nq, nd = labels.shape
    print(f"[corpus] train: {len(train['queries'])} queries / "
          f"{len(train['docs'])} docs; eval: {nq} queries / {nd} docs; "
          f"tokenizer={args.tokenizer}", file=sys.stderr)

    results = {}

    # ---------------------------------------------------------- 1. BM25 only
    doc_toks = [tokenize(d) for d in evals["docs"]]
    bm = BM25Okapi(doc_toks)
    t0 = time.perf_counter()
    bm25_idx, bm25_top = bm.get_topk_batch(
        [tokenize(q) for q in evals["queries"]], nd)
    bm25_scores = np.zeros((nq, nd), np.float32)
    np.put_along_axis(bm25_scores, bm25_idx, bm25_top, axis=1)
    results["bm25_only"] = ranking_metrics(bm25_scores, labels)
    print(f"[1/5] bm25: {results['bm25_only']} "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)

    # --------------------------------------------------- tokenizer choice
    loaded_encoder = None
    if args.load_encoder:
        from semanticsearch_tpu.train.encoder_train import load_encoder

        loaded_encoder = load_encoder(args.load_encoder)
        print(f"[tok] reusing trained encoder from {args.load_encoder}",
              file=sys.stderr)
    tokenizer = None
    vocab_size = args.vocab_size
    if args.tokenizer == "subword":
        if loaded_encoder is not None:
            tokenizer = loaded_encoder.tokenizer
            if tokenizer is None:
                ap.error("--load-encoder checkpoint carries no tokenizer "
                         "but --tokenizer subword was requested")
            vocab_size = tokenizer.vocab_size
        else:
            from semanticsearch_tpu.models.subword import train_bpe

            t0 = time.perf_counter()
            # fit on the TRAIN split only (no eval leakage); the eval
            # split's unseen inflections must decompose through learned
            # pieces
            tokenizer = train_bpe(
                list(train["docs"]) + list(train["queries"]),
                vocab_size=args.vocab_size, max_len=32,
            )
            vocab_size = tokenizer.vocab_size
            print(f"[tok] BPE fit: {len(tokenizer.vocab)} pieces "
                  f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)

    # ------------------------------------------- 2. dense w/ RANDOM encoder
    enc_cfg = EncoderConfig(vocab_size=vocab_size, hidden_dim=128,
                            num_layers=2, num_heads=4, mlp_dim=256,
                            max_len=32, dtype="float32")
    encoder = SentenceEncoder(enc_cfg, seed=args.seed, tokenizer=tokenizer)
    qe = encoder.encode(evals["queries"])
    de = encoder.encode(evals["docs"])
    results["dense_random_encoder"] = ranking_metrics(qe @ de.T, labels)
    print(f"[2/5] dense(random): {results['dense_random_encoder']}",
          file=sys.stderr)

    # ----------------------------------------- 3. dense w/ TRAINED encoder
    if args.mlm_epochs > 0 and loaded_encoder is None:
        from semanticsearch_tpu.train.mlm_pretrain import (
            MLMConfig, MLMPretrainer,
        )

        t0 = time.perf_counter()
        mlm_hist = MLMPretrainer(
            encoder, MLMConfig(epochs=args.mlm_epochs, max_len=32,
                               seed=args.seed),
        ).fit(list(train["docs"]))
        print(f"[3/5] mlm pretrain: loss {mlm_hist[0]['loss']:.3f} -> "
              f"{mlm_hist[-1]['loss']:.3f} over {len(mlm_hist)} epochs "
              f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)
    train_labels = relevance(train)
    pairs, negs, pair_rel = [], [], []
    rng = np.random.default_rng(args.seed)
    for qi, q in enumerate(train["queries"]):
        rel = np.nonzero(train_labels[qi])[0]
        irr = np.nonzero(train_labels[qi] == 0)[0]
        for di in rel:
            pairs.append((q, train["docs"][di]))
            negs.append(train["docs"][rng.choice(irr)])
            pair_rel.append(rel)
    t0 = time.perf_counter()
    if loaded_encoder is not None:
        encoder = loaded_encoder
        print("[3/5] contrastive train: SKIPPED (--load-encoder)",
              file=sys.stderr)
    else:
        con_cfg = ContrastiveConfig(epochs=args.epochs, batch_size=64,
                                    learning_rate=1e-3, max_len_query=16,
                                    max_len_chunk=32, seed=args.seed)
        if args.mine_rounds > 1:
            from semanticsearch_tpu.train.encoder_train import fit_with_mining

            import dataclasses as _dc0

            stage_cfg = _dc0.replace(
                con_cfg, epochs=max(1, args.epochs // args.mine_rounds))
            hist = fit_with_mining(
                encoder, stage_cfg, pairs, list(train["docs"]), pair_rel,
                initial_negatives=negs, rounds=args.mine_rounds)
        else:
            hist = ContrastiveEncoderTrainer(encoder, con_cfg).fit(
                pairs, hard_negatives=negs)
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

    # -------------- 4b. hybrid WEIGHTED RRF, alpha tuned on HELD-OUT VAL
    # beyond-parity (train/fusion.py): the fusion alpha is grid-searched on
    # a VALIDATION split the encoder never trained on (fresh queries and
    # docs from the same topics, seed-disjoint from the eval split) and
    # applied unchanged to the eval corpus. Tuning on the TRAIN split is
    # degenerate: the contrastively-trained encoder is near-perfect on its
    # own training queries (measured train MAP 0.999), so the tuner would
    # always collapse to alpha=1.0 instead of the generalizing mix.
    from semanticsearch_tpu.train.fusion import (
        tune_fusion_alpha, weighted_rrf,
    )

    t0 = time.perf_counter()
    val = build_split(args.seed + 2000, n_queries_per_topic=args.eval_qpt,
                      qv=qv, dv=dv, docs_per_class=args.docs_per_class)
    val_labels = relevance(val)
    n_vq, n_vd = val_labels.shape
    qe_val = encoder.encode(val["queries"])
    de_val = encoder.encode(val["docs"])
    bm_val = BM25Okapi([tokenize(d) for d in val["docs"]])
    val_idx, val_top = bm_val.get_topk_batch(
        [tokenize(q) for q in val["queries"]], n_vd)
    bm_val_scores = np.zeros((n_vq, n_vd), np.float32)
    np.put_along_axis(bm_val_scores, val_idx, val_top, axis=1)
    alpha, val_map, _ = tune_fusion_alpha(
        qe_val @ de_val.T, bm_val_scores, val_labels)
    wrrf_scores = weighted_rrf(dense_scores, bm25_scores, alpha=alpha)
    results["hybrid_wrrf_tuned"] = ranking_metrics(wrrf_scores, labels)
    print(f"[4b/5] hybrid wrrf (alpha={alpha:.2f}, val MAP {val_map:.4f}): "
          f"{results['hybrid_wrrf_tuned']} "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)
    if args.rerank_candidates == "wrrf":
        rrf_scores = wrrf_scores  # rerankers rescore the tuned fusion's head

    # blend-tuning split: FRESH queries+docs (seed+3000), disjoint from the
    # alpha-tuning split above — tuning beta where alpha was fitted would
    # flatter the beta=0 arm (the generator rides its in-sample alpha there)
    # and bias the blend toward dropping the reranker
    bval = build_split(args.seed + 3000, n_queries_per_topic=args.eval_qpt,
                       qv=qv, dv=dv, docs_per_class=args.docs_per_class)
    bval_labels = relevance(bval)
    n_bq, n_bd = bval_labels.shape
    qe_bv = encoder.encode(bval["queries"])
    de_bv = encoder.encode(bval["docs"])
    bm_bv = BM25Okapi([tokenize(d) for d in bval["docs"]])
    bv_idx, bv_top = bm_bv.get_topk_batch(
        [tokenize(q) for q in bval["queries"]], n_bd)
    bm_bv_scores = np.zeros((n_bq, n_bd), np.float32)
    np.put_along_axis(bm_bv_scores, bv_idx, bv_top, axis=1)
    bval_gen_scores = weighted_rrf(
        qe_bv @ de_bv.T, bm_bv_scores,
        alpha=alpha if args.rerank_candidates == "wrrf" else None)

    # ------------------------------------- 5. hybrid + trained rerankers
    if args.rerankers in ("none", ""):
        model_names = []
    else:
        # "all" expands to the seven PARITY models (the reference's
        # families); cross_encoder is requested explicitly or via
        # "all,cross_encoder"
        model_names = []
        for m in args.rerankers.split(","):
            m = m.strip()
            if m == "all":
                model_names.extend(ALL_RERANKERS)
            elif m:
                model_names.append(m)

    if model_names:
        top = args.rerank_top
        # keep-best: hold out the LAST train query of each topic as the
        # validation split (train queries are emitted topic-major); the
        # reranker never trains on them, eval queries stay untouched
        n_train_q = len(train["queries"])
        val_qids = (
            set(range(args.train_qpt - 1, n_train_q, args.train_qpt))
            if args.reranker_keep_best and args.train_qpt > 1 else set()
        )
        # shared train subsample: per query, all rel + 24 random irr
        sub_rows, val_rows = [], []
        for qi in range(n_train_q):
            rel = np.nonzero(train_labels[qi])[0]
            irr = rng.choice(np.nonzero(train_labels[qi] == 0)[0], size=24,
                             replace=False)
            rows = val_rows if qi in val_qids else sub_rows
            rows.extend((qi, di) for di in list(rel) + list(irr))
        # eval pairs: ONLY each query's top-`rerank_top` RRF candidates
        # (the serve shape; a full nq x nd cross product would be 1M+ pairs
        # per model at --scale)
        cand_rows = []
        for qi in range(nq):
            for di in np.argsort(-rrf_scores[qi])[:top]:
                cand_rows.append((qi, int(di)))
        # blend-tuning candidates: the blend-val split's fused top-`top`
        # under the same generator the rerankers rescore — the blend beta
        # is grid-searched there (never on eval, and never on the split
        # that fitted alpha) and applied unchanged to eval: the
        # train/fusion.py discipline extended to the rerank stage
        blend_rows = []
        for qi in range(n_bq):
            for di in np.argsort(-bval_gen_scores[qi])[:top]:
                blend_rows.append((qi, int(di)))

        _bundles = {}

        def _pair_ds(pp, rows, queries, docs, lab):
            enc = pp.transform_pair([queries[qi] for qi, _ in rows],
                                    [docs[di] for _, di in rows])
            return PairDataset(
                left=enc["left"], right=enc["right"],
                labels=np.asarray([lab[qi, di] for qi, di in rows],
                                  np.float32),
                query_ids=np.asarray([qi for qi, _ in rows]),
            )

        def bundle(lengths):
            """(pp, train_ds, val_ds, cand_ds, blend_ds) at the given
            (left, right) lengths. ArcII's fixed-stride pools + flatten need
            lengths that survive two 3x3 pools; the other models use the
            cheaper 8/16 (word) / 12/32 (subword pieces run longer than
            words)."""
            if lengths in _bundles:
                return _bundles[lengths]
            ll, lr = lengths
            if args.reranker_vocab == "subword":
                pp = Preprocessor(fixed_length_left=ll, fixed_length_right=lr,
                                  filter_low_freq=1, subword=tokenizer)
            else:
                pp = Preprocessor(fixed_length_left=ll, fixed_length_right=lr,
                                  filter_low_freq=1)
                pp.fit(list(train["queries"]) + list(train["docs"]))
            train_ds = _pair_ds(pp, sub_rows, train["queries"], train["docs"],
                                train_labels)
            if teacher_tr is not None:
                train_ds.teacher = teacher_tr
            val_ds = (_pair_ds(pp, val_rows, train["queries"], train["docs"],
                               train_labels) if val_rows else None)
            cand_ds = _pair_ds(pp, cand_rows, evals["queries"], evals["docs"],
                               labels)
            blend_ds = _pair_ds(pp, blend_rows, bval["queries"],
                                bval["docs"], bval_labels)
            _bundles[lengths] = (pp, train_ds, val_ds, cand_ds, blend_ds)
            return _bundles[lengths]

    embed_matrix = None
    embed_dim = 64
    if model_names and args.reranker_embed_init in ("encoder", "encoder_full"):
        from semanticsearch_tpu.train.embeddings import (
            encoder_token_embeddings,
        )

        embed_matrix = encoder_token_embeddings(encoder)
        embed_dim = embed_matrix.shape[1]

    # distillation teacher: the trained dual encoder's cosine per train row
    teacher_tr = None
    if model_names and args.reranker_distill > 0:
        qe_tr = encoder.encode(train["queries"])
        de_tr = encoder.encode(train["docs"])
        teacher_tr = np.asarray(
            [float(qe_tr[qi] @ de_tr[di]) for qi, di in sub_rows], np.float32)

    blends = {}
    for model_name in model_names:
        if model_name == "arcii":
            lengths = (12, 18)  # fixed-stride pools constrain both lengths
        elif args.reranker_vocab == "subword":
            lengths = (12, 32)  # pieces run ~2x longer than words
        else:
            lengths = (8, 16)
        pp, train_ds, val_ds, cand_ds, blend_ds = bundle(lengths)
        # each model keeps ITS reference-derived preset loss / clip / arch
        # kwargs (train/presets.py); the optimizer is compute-budget
        # adjusted to adam@1e-3 for every model — measured: adadelta@1.0
        # (the reference's choice, tuned for 10-30 epochs) moves the
        # LSTM-family loss 1.61->1.37 in the 4-epoch budget while adam@1e-3
        # reaches 0.23; adam@1e-2 diverges (hinge pinned at 1.0)
        import dataclasses as _dc

        from semanticsearch_tpu.train.presets import get_preset

        preset_cfg, model_kwargs = get_preset(model_name)
        # the cross_encoder keeps its preset optimizer (adam@2e-4 —
        # fine-tuning lr: at 1e-3 a warm-started transformer stack gets
        # scrambled before the rank loss can use it); the seven parity
        # models keep the budget-adjusted adam@1e-3 above
        opt_name, opt_lr = (
            (preset_cfg.optimizer, preset_cfg.learning_rate)
            if model_name == "cross_encoder" else ("adam", 1e-3)
        )
        tr_cfg = _dc.replace(
            preset_cfg, epochs=args.reranker_epochs, batch_size=64,
            num_dup=1, num_neg=4, embedding_dim=embed_dim, filter_low_freq=1,
            optimizer=opt_name, learning_rate=opt_lr,
            fixed_length_left=lengths[0], fixed_length_right=lengths[1],
            keep_best=args.reranker_keep_best,
            patience=args.reranker_patience,
            eval_metrics=("map",),
            distill_weight=args.reranker_distill,
            distill_scale=args.reranker_distill_scale,
        )
        warm_start = None
        if (model_name == "cross_encoder"
                and args.reranker_embed_init == "encoder_full"):
            from semanticsearch_tpu.models.rerankers import (
                transfer_from_encoder,
            )

            # arch kwargs must mirror the trained encoder so the block
            # copy is a plain tree transfer
            model_kwargs.update(
                num_layers=enc_cfg.num_layers, num_heads=enc_cfg.num_heads,
                mlp_dim=enc_cfg.mlp_dim,
            )
            enc_params = encoder.params

            def warm_start(p, _enc=enc_params):
                return transfer_from_encoder(p, _enc)

        t0 = time.perf_counter()
        reranker = RerankTrainer(model_name, vocab_size=pp.vocab_size,
                                 cfg=tr_cfg, model_kwargs=model_kwargs,
                                 embedding_matrix=embed_matrix,
                                 warm_start_fn=warm_start)
        fit_res = reranker.fit(train_ds, test_ds=val_ds)
        cand_pred = reranker.predict(fit_res.params, cand_ds)
        final_scores = np.full((nq, nd), -np.inf, np.float32)
        off = 0
        for qi in range(nq):
            order = np.argsort(-rrf_scores[qi])
            cand = order[:top]
            final_scores[qi, cand] = cand_pred[off: off + cand.size]
            off += cand.size
            tail = order[top:]
            # keep tail ordered after the reranked head
            lo = final_scores[qi, cand].min()
            final_scores[qi, tail] = lo - 1.0 - np.arange(tail.size)
        key = f"hybrid_plus_{model_name}"
        results[key] = ranking_metrics(final_scores, labels)
        print(f"[5/5] {key}: {results[key]} "
              f"(train loss {fit_res.history[0]['loss']:.3f} -> "
              f"{fit_res.history[-1]['loss']:.3f}, "
              f"{time.perf_counter()-t0:.1f}s)", file=sys.stderr)
        # rank-RRF blend curve (ranking.rerank_blend semantics,
        # index/query_engine.py): beta=1 is the pure-reranker row above,
        # beta=0 the candidate generator. Pure numpy reordering of already
        # computed predictions — consumes no RNG, changes no other row.
        curve = {str(b): m for b, m in _blend_eval(
            rrf_scores, cand_pred, top, (0.25, 0.5, 0.75), labels).items()}
        blends.setdefault(model_name, {}).update(curve)
        print(f"[5/5] {key} blend curve: "
              + ", ".join(f"b={b}: map {m['map']:.4f}"
                          for b, m in curve.items()), file=sys.stderr)
        # VALIDATION-TUNED blend: fine beta grid (1/16 steps) scored on the
        # fresh blend-val split's candidates (disjoint from the alpha
        # split), best beta applied unchanged to eval. Ties break toward
        # beta=1.0 — the reference's pure-rescoring semantics — matching
        # tune_rerank_blend (serve).
        blend_pred = reranker.predict(fit_res.params, blend_ds)
        fine_grid = tuple(np.round(np.linspace(0.0, 1.0, 17), 4))
        vtab = _blend_eval(bval_gen_scores, blend_pred, top, fine_grid,
                           bval_labels, metrics=("map",))
        beta_star = max(vtab, key=lambda b: (vtab[b]["map"], b))
        tuned = _blend_eval(rrf_scores, cand_pred, top, (beta_star,), labels,
                            metrics=("map", "ndcg@10", "p@10", "mrr"))
        results[f"{key}_blend_tuned"] = tuned[beta_star]
        blends[model_name]["tuned"] = {
            "beta": beta_star, "val_map": vtab[beta_star]["map"],
            **tuned[beta_star],
        }
        print(f"[5/5] {key} blend TUNED: beta={beta_star} "
              f"(val MAP {vtab[beta_star]['map']:.4f}) -> "
              f"eval {tuned[beta_star]}", file=sys.stderr)

    # ------------------------------------------------------------- report
    md = ["| Method | MAP | nDCG@10 | P@10 | MRR |", "|---|---|---|---|---|"]
    for name, m in results.items():
        md.append(f"| {name} | {m['map']:.4f} | {m['ndcg@10']:.4f} "
                  f"| {m['p@10']:.4f} | {m['mrr']:.4f} |")
    table = "\n".join(md)
    with open(os.path.join(args.output, "quality.md"), "w") as f:
        f.write(table + "\n")
    print(table, file=sys.stderr)
    print(json.dumps({
        "metric": "quality_map_ndcg", "results": results,
        "eval_queries": nq, "eval_docs": nd, "topics": args.topics,
        "tokenizer": args.tokenizer, "seed": args.seed,
        "reranker_vocab": args.reranker_vocab,
        "reranker_embed_init": args.reranker_embed_init,
        "reranker_keep_best": args.reranker_keep_best,
        "rerank_candidates": args.rerank_candidates,
        "reranker_distill": args.reranker_distill,
        "reranker_distill_scale": args.reranker_distill_scale,
        "fusion_alpha": alpha,
        "mlm_epochs": args.mlm_epochs,
        "mine_rounds": args.mine_rounds,
        **({"rerank_blend_curve": blends} if blends else {}),
    }))


if __name__ == "__main__":
    main()
