"""Chunking-method downstream quality A/B — the reference's core experiment.

The reference exists to compare chunking strategies THROUGH the retrieval /
rerank pipeline: its 7 named configs
(``data_process/simple_chunk_controller.py:1443-1555``) feed the optional
rank stage (``:1389-1414``), whose labeled chunks train the rerankers. This
tool produces the number that experiment is for: does semantic chunking beat
naive chunking downstream, on MAP/nDCG@10?

Protocol (identical per chunking config, VERDICT-r3 item 1):
  1. generate a DISTRIBUTION-REALISTIC corpus (VERDICT-r3 item 7): document
     word counts matched to the reference's `document_length_summary.json`
     (median ~256 / mean ~1000 words, 20% one-to-few-sentence stubs, long
     tail capped by --max-words), Zipfian filler vocabulary in the thousands
     of types, multi-TOPIC documents: each content doc concatenates 1-4
     contiguous topic passages (lexical or paraphrase-only, with
     morphological inflections) interleaved with filler; trap docs carry
     query vocabulary without a real passage;
  2. train ONE dual encoder per seed on (train query, gold passage) pairs —
     shared by every config so the chunking method is the only variable;
  3. per config: chunk ALL docs via `chunking/pipeline.py` (the full
     clean -> segment -> embed -> chunk path), then
  4. rank: hybrid dense+BM25+weighted-RRF over chunks (alpha tuned on a
     held-out val split at the DOC level), score each doc by its best chunk
     (max-agg), and percentile-label train-query chunks
     (`index/ranker.py::percentile_labels` over per-query unweighted RRF —
     the reference's `rank_chunks_optimized.py:517-526` rule);
  5. rerank: train a reranker on those labeled chunk pairs, rescore each
     eval query's top candidates, blend beta tuned on a second disjoint val
     split (the fc7ad29 discipline), doc-level metrics again.

Doc-level evaluation makes configs comparable: every config retrieves the
same documents for the same queries — only the chunk substrate differs.
A `whole_doc` baseline row (no chunking: truncated-doc dense + full-doc
BM25) anchors the comparison.

Usage:
  python tools/eval_chunking.py --seed 0            # ~10-20 min CPU
  python tools/eval_chunking.py --configs text_splitter_char,semantic_splitter
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import re
import time

import numpy as np

from eval_quality import ranking_metrics  # noqa: E402  (tools/ sibling)

SUFFIXES = ["", "s", "ed", "ing"]
DEFAULT_CONFIGS = "text_splitter_char,semantic_splitter,semantic_grouping"


# --------------------------------------------------------------------------
# realistic corpus generator
# --------------------------------------------------------------------------

class CorpusSpec:
    """Vocabulary + Zipf filler distribution, fixed per run."""

    def __init__(self, n_topics: int, filler_types: int, seed: int):
        rng = np.random.default_rng(seed)
        self.n_topics = n_topics
        self.qv = [[f"query{t}term{j}" for j in range(5)]
                   for t in range(n_topics)]
        self.dv = [[f"doc{t}word{j}" for j in range(8)]
                   for t in range(n_topics)]
        # Zipfian filler vocabulary (reference corpus vocab is Zipfian with
        # thousands of types; `document_length_summary.json` shows ~27 words
        # per sentence on average)
        self.filler = np.array([f"filler{i}" for i in range(filler_types)])
        ranks = np.arange(1, filler_types + 1, dtype=np.float64)
        p = 1.0 / ranks ** 1.07
        self.filler_p = p / p.sum()
        self.dv_stems = {w: t for t in range(n_topics) for w in self.dv[t]}
        del rng

    def inflect(self, rng, words):
        return [w + SUFFIXES[rng.integers(len(SUFFIXES))] for w in words]

    def filler_words(self, rng, n):
        return list(rng.choice(self.filler, size=n, p=self.filler_p))

    def sentence(self, rng, topic_pool=None, topic_frac=0.55):
        """One sentence, ~5-60 words (lognormal around the reference's ~27
        avg words/sentence), mixing topic vocabulary with Zipf filler."""
        n = int(np.clip(rng.lognormal(np.log(20.0), 0.55), 5, 60))
        if topic_pool is not None:
            k = max(2, int(round(n * topic_frac)))
            words = self.inflect(rng, list(rng.choice(topic_pool, size=k)))
            words += self.filler_words(rng, n - k)
            rng.shuffle(words)
        else:
            words = self.filler_words(rng, n)
        return " ".join(words).capitalize() + "."

    def passage(self, rng, topic, kind):
        """Contiguous topic passage, 4-10 sentences. `lexical` passages use
        query+doc vocabulary (BM25-findable); `paraphrase` passages use doc
        vocabulary only (vocabulary disjoint from queries — semantics-only,
        the eval_quality.py separation carried over)."""
        pool = (self.qv[topic] + self.dv[topic] if kind == "lexical"
                else self.dv[topic])
        n_sent = int(rng.integers(4, 11))
        return [self.sentence(rng, np.array(pool)) for _ in range(n_sent)]

    def query(self, rng, topic):
        return " ".join(self.inflect(rng, list(rng.choice(self.qv[topic],
                                                          size=3))))


def build_corpus(spec: CorpusSpec, seed: int, docs_per_topic: int,
                 max_words: int, n_filler_docs: int, n_trap_docs: int):
    """Documents with realistic length stats + gold passage assignments.

    Returns dict with docs (texts), doc_topics (list of topic sets),
    passages (flat list of (topic, kind, text) for encoder training).
    """
    rng = np.random.default_rng(seed)
    # passage requests: half lexical / half paraphrase per topic
    requests = []
    for t in range(spec.n_topics):
        kinds = (["lexical"] * (docs_per_topic // 2)
                 + ["paraphrase"] * (docs_per_topic - docs_per_topic // 2))
        requests.extend((t, k) for k in kinds)
    rng.shuffle(requests)

    # content docs: each takes 1-4 passage requests
    content_docs = []
    i = 0
    while i < len(requests):
        take = int(rng.integers(1, 5))
        content_docs.append(requests[i: i + take])
        i += take

    docs, doc_topics = [], []
    passages = []

    def doc_length(rng):
        """Word-count target matched to document_length_summary.json:
        ~20% stubs (p10=5 words, 26.7k single-sentence docs), body
        lognormal(median 256, sigma 1.55), tail capped at --max-words
        (reference max 66,096 — capped for CPU runtime, cap documented)."""
        if rng.random() < 0.2:
            return int(rng.integers(5, 41))
        return int(np.clip(rng.lognormal(np.log(256.0), 1.55), 41, max_words))

    for req in content_docs:
        topics = set()
        blocks = []  # list of sentence-lists
        words_used = 0
        for (t, kind) in req:
            sents = spec.passage(rng, t, kind)
            passages.append((t, kind, " ".join(sents)))
            blocks.append(sents)
            topics.add(t)
            words_used += sum(len(s.split()) for s in sents)
        target = max(doc_length(rng), words_used)
        # filler blocks interleaved between/around the passages
        filler_sents = []
        while words_used < target:
            s = spec.sentence(rng)
            filler_sents.append(s)
            words_used += len(s.split())
        # split filler into len(blocks)+1 gaps
        gaps = [[] for _ in range(len(blocks) + 1)]
        for s in filler_sents:
            gaps[rng.integers(len(gaps))].append(s)
        out = list(gaps[0])
        for b, g in zip(blocks, gaps[1:]):
            out.extend(b)
            out.extend(g)
        docs.append(" ".join(out))
        doc_topics.append(topics)

    for _ in range(n_filler_docs):
        target = doc_length(rng)
        sents, words_used = [], 0
        while words_used < target:
            s = spec.sentence(rng)
            sents.append(s)
            words_used += len(s.split())
        docs.append(" ".join(sents))
        doc_topics.append(set())

    # lexical traps: filler docs sprinkled with a topic's QUERY vocabulary
    # (BM25 false hits; relevant to nobody)
    for _ in range(n_trap_docs):
        t = int(rng.integers(spec.n_topics))
        target = max(doc_length(rng), 60)
        sents, words_used = [], 0
        while words_used < target:
            if rng.random() < 0.3:
                s = spec.sentence(rng, np.array(spec.qv[t][:2]),
                                  topic_frac=0.25)
            else:
                s = spec.sentence(rng)
            sents.append(s)
            words_used += len(s.split())
        docs.append(" ".join(sents))
        doc_topics.append(set())

    order = rng.permutation(len(docs))
    docs = [docs[i] for i in order]
    doc_topics = [doc_topics[i] for i in order]
    return {"docs": docs, "doc_topics": doc_topics, "passages": passages}


def query_split(spec: CorpusSpec, seed: int, qpt: int):
    rng = np.random.default_rng(seed)
    queries, q_topics = [], []
    for t in range(spec.n_topics):
        for _ in range(qpt):
            queries.append(spec.query(rng, t))
            q_topics.append(t)
    return queries, np.asarray(q_topics)


def doc_labels(q_topics, doc_topics):
    lab = np.zeros((len(q_topics), len(doc_topics)), np.float32)
    for qi, t in enumerate(q_topics):
        for di, ts in enumerate(doc_topics):
            if t in ts:
                lab[qi, di] = 1.0
    return lab


# --------------------------------------------------------------------------
# scoring helpers
# --------------------------------------------------------------------------

def doc_agg(chunk_scores, chunk_doc, n_docs):
    """(nq, n_chunks) -> (nq, n_docs) by max over each doc's chunks."""
    nq = chunk_scores.shape[0]
    out = np.full((nq, n_docs), -np.inf, np.float32)
    for qi in range(nq):
        np.maximum.at(out[qi], chunk_doc, chunk_scores[qi])
    return out


def tune_alpha_doclevel(dense, bm25, chunk_doc, n_docs, labels, weighted_rrf):
    best = (None, -1.0)
    for alpha in np.linspace(0.0, 1.0, 17):
        s = doc_agg(weighted_rrf(dense, bm25, alpha=float(alpha)),
                    chunk_doc, n_docs)
        m = ranking_metrics(s, labels, metrics=("map",))["map"]
        if m > best[1]:
            best = (float(alpha), m)
    return best


def chunk_purity(chunk_texts, dv_stems):
    """Per-chunk topical purity: among topic-vocabulary tokens in the chunk,
    the fraction belonging to the majority topic. Proxy for boundary quality
    (dv words occur only inside gold passages). Chunks with <3 topic tokens
    are skipped. Returns (mean purity, multi-topic chunk fraction)."""
    strip = re.compile(r"(ing|ed|s)$")
    purities, multi = [], 0
    for text in chunk_texts:
        counts = {}
        for w in text.lower().split():
            w = w.rstrip(".")
            stem = w if w in dv_stems else strip.sub("", w)
            t = dv_stems.get(stem)
            if t is not None:
                counts[t] = counts.get(t, 0) + 1
        total = sum(counts.values())
        if total < 3:
            continue
        purities.append(max(counts.values()) / total)
        if len(counts) > 1:
            multi += 1
    if not purities:
        return 1.0, 0.0
    return float(np.mean(purities)), multi / len(purities)


# --------------------------------------------------------------------------
# main
# --------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="/tmp/semsearch_chunking_ab")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--topics", type=int, default=32)
    ap.add_argument("--docs-per-topic", type=int, default=6)
    ap.add_argument("--filler-docs", type=int, default=40)
    ap.add_argument("--trap-docs", type=int, default=24)
    ap.add_argument("--filler-types", type=int, default=4000)
    ap.add_argument("--max-words", type=int, default=6000,
                    help="doc length cap (reference max is 66k; capped for "
                         "CPU runtime — the cap is reported)")
    ap.add_argument("--train-qpt", type=int, default=4)
    ap.add_argument("--val-qpt", type=int, default=2)
    ap.add_argument("--eval-qpt", type=int, default=3)
    ap.add_argument("--configs", default=DEFAULT_CONFIGS)
    ap.add_argument("--char-size", type=int, default=0,
                    help=">0: register an extra char config at this chunk "
                         "size (granularity control: char at the SEMANTIC "
                         "methods' chunk count isolates boundary quality "
                         "from chunk-size effects)")
    ap.add_argument("--rerankers", default="knrm",
                    help="comma list or 'none'; trained per config on the "
                         "percentile-labeled chunks. 'cross_encoder' gets "
                         "the capstone levers (warm start, --ce-* flags); "
                         "'cross_encoder_distill' adds margin-MSE "
                         "distillation from the generator encoder")
    ap.add_argument("--reranker-epochs", type=int, default=4)
    ap.add_argument("--rerank-top", type=int, default=20)
    ap.add_argument("--encoder-epochs", type=int, default=12)
    ap.add_argument("--recipe", choices=["basic", "capstone"],
                    default="basic",
                    help="capstone = the full best-known encoder recipe "
                         "(MLM pretrain + contrastive with hard-negative "
                         "self-mining, BASELINE.md 'Capstone') — VERDICT-r4 "
                         "item 1: unify the quality story on the realistic "
                         "corpus at the best chunking configs")
    ap.add_argument("--mlm-epochs", type=int, default=3,
                    help="capstone: MLM denoising epochs on the raw docs")
    ap.add_argument("--mine-rounds", type=int, default=2,
                    help="capstone: contrastive stages with ANCE-style "
                         "negative re-mining between them (total epoch "
                         "budget stays --encoder-epochs)")
    ap.add_argument("--ce-epochs", type=int, default=12,
                    help="cross-encoder training epochs (it underfits at "
                         "the parity models' 4 — BASELINE.md r3)")
    ap.add_argument("--ce-top", type=int, default=50,
                    help="cross-encoder candidate pool per query "
                         "(VERDICT-r4 item 4: 24 was too little signal)")
    ap.add_argument("--ce-distill", type=float, default=0.5,
                    help="margin-MSE distillation weight for the "
                         "cross_encoder_distill alias")
    ap.add_argument("--ce-configs", default="",
                    help="comma list of chunking configs that run the "
                         "RESTRICTED rerankers (empty = all configs) — "
                         "expensive legs only need the headline config")
    ap.add_argument("--restricted-rerankers", default="cross_encoder",
                    help="comma list (prefix match) of rerankers limited "
                         "to --ce-configs; default restricts the "
                         "cross_encoder* aliases")
    ap.add_argument("--variant", action="append", default=[],
                    metavar="NAME=BASE:k=v[,k=v...]",
                    help="register a chunking-config variant (granularity "
                         "sweep): e.g. dp_fine=semantic_splitter_dp:"
                         "dp_penalty_scale=0.25 — keys are ChunkingConfig "
                         "fields; the variant joins --configs")
    ap.add_argument("--vocab-size", type=int, default=4096)
    ap.add_argument("--tokenizer", choices=["subword", "hash"],
                    default="subword",
                    help="hash: FNV hashing tokenizer at the SAME vocab "
                         "budget — re-derives the subword-vs-hash headline "
                         "A/B on the distribution-realistic corpus "
                         "(VERDICT-r3 weak 5). Requires --rerankers none "
                         "(the reranker leg's piece vocab is subword-only)")
    ap.add_argument("--max-sentences", type=int, default=512,
                    help="chunker sentence cap per doc (CPU eigh cost)")
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from semanticsearch_tpu.chunking.pipeline import ChunkPipeline
    from semanticsearch_tpu.core.config import (
        EncoderConfig, RankingConfig, get_named_config,
    )
    from semanticsearch_tpu.data.tsv import read_tsv, write_tsv
    from semanticsearch_tpu.index.bm25 import BM25Okapi, tokenize
    from semanticsearch_tpu.index.ranker import percentile_labels
    from semanticsearch_tpu.index.rrf import rrf_fuse
    from semanticsearch_tpu.models.encoder import SentenceEncoder
    from semanticsearch_tpu.models.subword import train_bpe
    from semanticsearch_tpu.train.encoder_train import (
        ContrastiveConfig, ContrastiveEncoderTrainer,
    )
    from semanticsearch_tpu.train.fusion import weighted_rrf

    t_start = time.perf_counter()
    spec = CorpusSpec(args.topics, args.filler_types, seed=args.seed + 77)
    corpus = build_corpus(spec, args.seed, args.docs_per_topic,
                          args.max_words, args.filler_docs, args.trap_docs)
    docs, doc_topics = corpus["docs"], corpus["doc_topics"]
    n_docs = len(docs)
    wc = np.array([len(d.split()) for d in docs])
    print(f"[corpus] {n_docs} docs, words median {int(np.median(wc))} "
          f"mean {wc.mean():.0f} p90 {int(np.percentile(wc, 90))} "
          f"max {wc.max()} (cap {args.max_words}); "
          f"{len(corpus['passages'])} gold passages", file=sys.stderr)

    tr_q, tr_t = query_split(spec, args.seed + 1, args.train_qpt)
    va_q, va_t = query_split(spec, args.seed + 2, args.val_qpt)   # alpha
    vb_q, vb_t = query_split(spec, args.seed + 3, args.val_qpt)   # blend beta
    ev_q, ev_t = query_split(spec, args.seed + 4, args.eval_qpt)
    lab_va = doc_labels(va_t, doc_topics)
    lab_vb = doc_labels(vb_t, doc_topics)
    lab_ev = doc_labels(ev_t, doc_topics)

    # ---------------- shared encoder (one per seed, all configs) ----------
    t0 = time.perf_counter()
    if args.tokenizer == "hash":
        if args.rerankers not in ("none", ""):
            ap.error("--tokenizer hash requires --rerankers none")
        tokenizer = None
        vocab_size = args.vocab_size
    else:
        tokenizer = train_bpe(docs + tr_q, vocab_size=args.vocab_size,
                              max_len=32)
        vocab_size = tokenizer.vocab_size
    enc_cfg = EncoderConfig(vocab_size=vocab_size, hidden_dim=128,
                            num_layers=2, num_heads=4, mlp_dim=256,
                            max_len=128, dtype="float32")
    encoder = SentenceEncoder(enc_cfg, seed=args.seed, tokenizer=tokenizer)
    rng = np.random.default_rng(args.seed)
    by_topic = {}
    for t, kind, text in corpus["passages"]:
        by_topic.setdefault(t, []).append(text)
    pairs, negs, pair_topics = [], [], []
    for q, t in zip(tr_q, tr_t):
        for pos in by_topic[int(t)]:
            pairs.append((q, pos))
            pair_topics.append(int(t))
            other = (int(t) + 1 + rng.integers(spec.n_topics - 1)) \
                % spec.n_topics
            negs.append(by_topic[other][rng.integers(len(by_topic[other]))])
    con_cfg = ContrastiveConfig(epochs=args.encoder_epochs, batch_size=64,
                                learning_rate=1e-3, max_len_query=16,
                                max_len_chunk=128, seed=args.seed)
    if args.recipe == "capstone":
        # the full best-known encoder recipe (BASELINE.md 'Capstone'):
        # MLM denoising on the raw docs, then the contrastive budget split
        # into stages with ANCE-style hard-negative re-mining between them
        import dataclasses as _dc

        from semanticsearch_tpu.train.encoder_train import fit_with_mining
        from semanticsearch_tpu.train.mlm_pretrain import (
            MLMConfig, MLMPretrainer,
        )

        if args.mlm_epochs > 0:
            mh = MLMPretrainer(encoder, MLMConfig(
                epochs=args.mlm_epochs, seed=args.seed)).fit(docs)
            print(f"[encoder] MLM loss {mh[0]['loss']:.3f} -> "
                  f"{mh[-1]['loss']:.3f} over {args.mlm_epochs} epochs "
                  f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)
        rounds = max(1, args.mine_rounds)
        stage_cfg = _dc.replace(
            con_cfg, epochs=max(1, args.encoder_epochs // rounds))
        pass_texts = [text for _, _, text in corpus["passages"]]
        topic_idx: dict = {}
        for j, (t, _, _) in enumerate(corpus["passages"]):
            topic_idx.setdefault(int(t), []).append(j)
        rel_idx = [topic_idx[t] for t in pair_topics]
        hist = fit_with_mining(encoder, stage_cfg, pairs, pass_texts,
                               rel_idx, initial_negatives=negs,
                               rounds=rounds)
    else:
        hist = ContrastiveEncoderTrainer(encoder, con_cfg).fit(
            pairs, hard_negatives=negs)
    print(f"[encoder] contrastive loss {hist[0]['loss']:.3f} -> "
          f"{hist[-1]['loss']:.3f}, {len(pairs)} pairs "
          f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)

    # query embeddings shared by every config
    emb_q = {"va": encoder.encode(va_q), "vb": encoder.encode(vb_q),
             "ev": encoder.encode(ev_q), "tr": encoder.encode(tr_q)}
    tok_q = {k: [tokenize(q) for q in qs]
             for k, qs in (("va", va_q), ("vb", vb_q), ("ev", ev_q),
                           ("tr", tr_q))}

    # ---------------- whole-doc baseline (NO chunking) --------------------
    results = {}
    t0 = time.perf_counter()
    de_full = encoder.encode(docs, batch_size=512)  # truncated at max_len
    bm_full = BM25Okapi([tokenize(d) for d in docs])

    def split_scores_fulldoc(key):
        dense = emb_q[key] @ de_full.T
        bm = np.stack([np.maximum(bm_full.get_scores(tq), 0.0)
                       for tq in tok_q[key]])
        return dense, bm

    dense_va, bm_va = split_scores_fulldoc("va")
    best_alpha = (None, -1.0)
    for alpha in np.linspace(0.0, 1.0, 17):
        m = ranking_metrics(weighted_rrf(dense_va, bm_va, alpha=float(alpha)),
                            lab_va, metrics=("map",))["map"]
        if m > best_alpha[1]:
            best_alpha = (float(alpha), m)
    dense_ev, bm_ev = split_scores_fulldoc("ev")
    results["whole_doc"] = {
        "hybrid_wrrf_tuned": ranking_metrics(
            weighted_rrf(dense_ev, bm_ev, alpha=best_alpha[0]), lab_ev),
        "bm25_only": ranking_metrics(bm_ev, lab_ev),
        "dense_trained": ranking_metrics(dense_ev, lab_ev),
        "alpha": best_alpha[0],
        "n_chunks": n_docs,
    }
    print(f"[whole_doc] alpha={best_alpha[0]:.2f} "
          f"wrrf {results['whole_doc']['hybrid_wrrf_tuned']} "
          f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)

    # ---------------- per chunking config ---------------------------------
    corpus_tsv = os.path.join(args.output, "corpus.tsv")
    write_tsv(corpus_tsv,
              ({"query_id": "", "document_id": f"d{di}", "document": d,
                "label": ""} for di, d in enumerate(docs)),
              ["query_id", "document_id", "document", "label"])

    model_names = ([] if args.rerankers in ("none", "")
                   else [m.strip() for m in args.rerankers.split(",") if m])

    cfg_names = [c.strip() for c in args.configs.split(",") if c.strip()]
    if args.char_size > 0:
        from semanticsearch_tpu.core.config import register_config

        name = f"char_{args.char_size}"
        register_config(name, get_named_config("text_splitter_char").override(
            chunking={"char_chunk_size": args.char_size,
                      "char_overlap": args.char_size // 10}))
        cfg_names.append(name)
    for spec_str in args.variant:
        # NAME=BASE:k=v[,k=v...] — ChunkingConfig field overrides
        from semanticsearch_tpu.core.config import register_config

        name, rest = spec_str.split("=", 1)
        base_name, _, kv_str = rest.partition(":")
        overrides = {}
        for kv in kv_str.split(","):
            if not kv:
                continue
            k2, v2 = kv.split("=")
            try:
                v2 = int(v2)
            except ValueError:
                try:
                    v2 = float(v2)
                except ValueError:
                    pass  # string field (e.g. engine=modularity)
            overrides[k2] = v2
        register_config(name, get_named_config(base_name).override(
            chunking=overrides))
        cfg_names.append(name)

    for cfg_name in cfg_names:
        t_cfg = time.perf_counter()
        cfg = get_named_config(cfg_name).override(
            chunking={"max_sentences": args.max_sentences})
        pipe = ChunkPipeline(cfg, encoder=encoder)
        run_dir = os.path.join(args.output, cfg_name)
        summary = pipe.run(corpus_tsv, run_dir, write_eval=False)
        rows = list(read_tsv(summary["output_path"]))
        chunk_texts = [r["chunk_text"] for r in rows]
        chunk_doc = np.asarray([int(r["document_id"][1:]) for r in rows])
        n_chunks = len(chunk_texts)
        purity, multi_frac = chunk_purity(chunk_texts, spec.dv_stems)
        print(f"[{cfg_name}] {n_chunks} chunks "
              f"({summary['chunks_per_sec']}/s), purity {purity:.3f}, "
              f"multi-topic {multi_frac:.3f}", file=sys.stderr)

        ce = encoder.encode(chunk_texts, batch_size=512)
        bm = BM25Okapi([tokenize(t) for t in chunk_texts])

        def split_scores(key, _ce=ce, _bm=bm):
            dense = emb_q[key] @ _ce.T
            bmat = np.stack([np.maximum(_bm.get_scores(tq), 0.0)
                             for tq in tok_q[key]])
            return dense, bmat

        dense_va, bm_va = split_scores("va")
        alpha, val_map = tune_alpha_doclevel(
            dense_va, bm_va, chunk_doc, n_docs, lab_va, weighted_rrf)
        dense_ev, bm_ev = split_scores("ev")
        wrrf_ev = weighted_rrf(dense_ev, bm_ev, alpha=alpha)
        res = {
            "bm25_only": ranking_metrics(
                doc_agg(bm_ev, chunk_doc, n_docs), lab_ev),
            "dense_trained": ranking_metrics(
                doc_agg(dense_ev, chunk_doc, n_docs), lab_ev),
            "hybrid_wrrf_tuned": ranking_metrics(
                doc_agg(wrrf_ev, chunk_doc, n_docs), lab_ev),
            "alpha": alpha, "alpha_val_map": val_map,
            "n_chunks": n_chunks, "purity": purity,
            "multi_topic_frac": multi_frac,
            "chunk_summary": {k: summary[k] for k in
                              ("chunks_out", "fallbacks", "avg_chunks_per_doc",
                               "chunk_words", "elapsed_s")},
        }
        print(f"[{cfg_name}] alpha={alpha:.2f} "
              f"wrrf {res['hybrid_wrrf_tuned']}", file=sys.stderr)

        # ---- rank/label stage on TRAIN queries: per-query unweighted RRF
        # (cosine + floored BM25, the reference rank_group semantics) then
        # percentile labels (rank_chunks_optimized.py:517-526). Score
        # matrices reuse the precomputed chunk embeddings/BM25.
        if model_names:
            rcfg = RankingConfig()
            dense_tr, bm_tr = split_scores("tr")
            labels_by_q = {}
            n_pos = n_neg = 0
            for qi in range(len(tr_q)):
                rrf = rrf_fuse([dense_tr[qi], bm_tr[qi]], k=rcfg.rrf_k)
                lab = percentile_labels(rrf, rcfg)
                pos_idx = np.nonzero(lab == 1)[0]
                neg_idx = np.nonzero(lab == 0)[0]
                labels_by_q[qi] = (pos_idx, neg_idx)
                n_pos += pos_idx.size
                n_neg += neg_idx.size
            res["labeled_pos"] = int(n_pos)
            res["labeled_neg"] = int(n_neg)

            from semanticsearch_tpu.train.embeddings import (
                encoder_token_embeddings,
            )
            from train_leg import train_rerankers_doclevel  # tools/ sibling

            # cross-encoder levers (VERDICT-r4 item 4): warm start, deeper
            # pool, longer schedule; the _distill alias adds margin-MSE
            # distillation from the generator's dual encoder
            ce_cfgs = {c.strip() for c in args.ce_configs.split(",")
                       if c.strip()}
            restricted = tuple(
                r.strip() for r in args.restricted_rerankers.split(",")
                if r.strip())
            cfg_model_names = [
                m for m in model_names
                if not (m.startswith(restricted) and ce_cfgs
                        and cfg_name not in ce_cfgs)
            ]
            model_opts = {}
            for m in cfg_model_names:
                if m.startswith("cross_encoder"):
                    model_opts[m] = {
                        "base": "cross_encoder", "warm_start": True,
                        "epochs": args.ce_epochs, "top": args.ce_top,
                    }
                    if m == "cross_encoder_distill":
                        model_opts[m]["distill"] = args.ce_distill
            rr = train_rerankers_doclevel(
                model_names=cfg_model_names,
                tokenizer=tokenizer,
                labels_by_q=labels_by_q,
                train_queries=tr_q,
                chunk_texts=chunk_texts, chunk_doc=chunk_doc,
                n_docs=n_docs,
                gen_scores={"ev": wrrf_ev,
                            "vb": weighted_rrf(*split_scores("vb"),
                                               alpha=alpha)},
                labels={"ev": lab_ev, "vb": lab_vb},
                queries={"ev": ev_q, "vb": vb_q},
                top=args.rerank_top, epochs=args.reranker_epochs,
                seed=args.seed, doc_agg=doc_agg,
                ranking_metrics=ranking_metrics,
                embed_matrix=encoder_token_embeddings(encoder),
                encoder=encoder, model_opts=model_opts,
            )
            res.update(rr)
        results[cfg_name] = res
        print(f"[{cfg_name}] done in {time.perf_counter()-t_cfg:.0f}s",
              file=sys.stderr)

    # ---------------- report ---------------------------------------------
    out = {
        "metric": "chunking_ab_doclevel",
        "seed": args.seed,
        "recipe": args.recipe,
        "topics": args.topics,
        "n_docs": n_docs,
        "doc_words": {"median": int(np.median(wc)), "mean": float(wc.mean()),
                      "p90": int(np.percentile(wc, 90)),
                      "max": int(wc.max()), "cap": args.max_words},
        "eval_queries": len(ev_q),
        "results": results,
        "elapsed_s": round(time.perf_counter() - t_start, 1),
    }
    print(json.dumps(out))
    md = [f"| config | MAP | nDCG@10 | chunks | purity |",
          "|---|---|---|---|---|"]
    for name, r in results.items():
        m = r["hybrid_wrrf_tuned"]
        md.append(f"| {name} | {m['map']:.4f} | {m['ndcg@10']:.4f} "
                  f"| {r['n_chunks']} | {r.get('purity', float('nan')):.3f} |")
    with open(os.path.join(args.output, "chunking_ab.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md), file=sys.stderr)


if __name__ == "__main__":
    main()
