"""Reranker leg for the chunking A/B: train on percentile-labeled chunks,
rescore top candidates, blend-tune beta on a disjoint split, evaluate at the
DOC level (max-chunk aggregation).

Mirrors the eval_quality.py reranker protocol (reference
``MatchZoo_Tool/train_controller.py`` semantics: pair sampling, preset loss,
fixed-length truncation) but aggregates chunk scores to documents before
computing metrics, because the chunking A/B compares configs on the same
document set.
"""
from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def _blend_chunk_scores(gen_scores, pred_flat, top, beta):
    """Rank-RRF blend of reranker vs generator order over each query's
    top-`top` chunks (``RankingConfig.rerank_blend`` semantics,
    index/query_engine.py:952); tail chunks keep generator order below."""
    nq, nc = gen_scores.shape
    out = np.full((nq, nc), -np.inf, np.float32)
    off = 0
    for qi in range(nq):
        order = np.argsort(-gen_scores[qi])
        cand = order[:top]
        pred = np.asarray(pred_flat[off: off + cand.size], np.float64)
        off += cand.size
        rr_rank = np.empty(cand.size, np.int64)
        rr_rank[np.argsort(-pred, kind="stable")] = \
            np.arange(1, cand.size + 1)
        fus_rank = np.arange(1, cand.size + 1)
        out[qi, cand] = (beta / (60 + rr_rank)
                         + (1 - beta) / (60 + fus_rank))
        tail = order[top:]
        lo = out[qi, cand].min()
        out[qi, tail] = lo - 1.0 - np.arange(tail.size)
    return out


def train_rerankers_doclevel(model_names, tokenizer, labels_by_q,
                             train_queries, chunk_texts, chunk_doc, n_docs,
                             gen_scores, labels, queries, top, epochs, seed,
                             doc_agg, ranking_metrics, embed_matrix=None):
    from semanticsearch_tpu.train.pairs import PairDataset
    from semanticsearch_tpu.train.presets import get_preset
    from semanticsearch_tpu.train.trainer import RerankTrainer
    from semanticsearch_tpu.train.vocab import Preprocessor

    rng = np.random.default_rng(seed + 9)
    res = {}

    # train rows from the percentile labels (cap per query: 8 pos / 24 neg)
    rows = []  # (query_idx, chunk_text, label)
    for qi in range(len(train_queries)):
        pos_idx, neg_idx = labels_by_q.get(qi, ((), ()))
        pos_idx, neg_idx = list(pos_idx), list(neg_idx)
        if not pos_idx or not neg_idx:
            continue
        if len(pos_idx) > 8:
            pos_idx = list(rng.choice(pos_idx, size=8, replace=False))
        if len(neg_idx) > 24:
            neg_idx = list(rng.choice(neg_idx, size=24, replace=False))
        rows.extend((qi, chunk_texts[int(ci)], 1.0) for ci in pos_idx)
        rows.extend((qi, chunk_texts[int(ci)], 0.0) for ci in neg_idx)
    if not rows:
        return {"reranker_skipped": "no labeled pairs"}

    # candidate rows per split: each query's top-`top` generator chunks
    cand = {}
    for key in ("ev", "vb"):
        cr = []
        for qi in range(gen_scores[key].shape[0]):
            for ci in np.argsort(-gen_scores[key][qi])[:top]:
                cr.append((qi, int(ci)))
        cand[key] = cr

    _bundles = {}

    def bundle(lengths):
        if lengths in _bundles:
            return _bundles[lengths]
        ll, lr = lengths
        pp = Preprocessor(fixed_length_left=ll, fixed_length_right=lr,
                          filter_low_freq=1, subword=tokenizer)

        def pair_ds(pairs_q, pairs_t, labs, qids):
            enc = pp.transform_pair(pairs_q, pairs_t)
            return PairDataset(left=enc["left"], right=enc["right"],
                               labels=np.asarray(labs, np.float32),
                               query_ids=np.asarray(qids))

        train_ds = pair_ds([train_queries[qi] for qi, _, _ in rows],
                           [t for _, t, _ in rows],
                           [l for _, _, l in rows],
                           [qi for qi, _, _ in rows])
        cand_ds = {key: pair_ds([queries[key][qi] for qi, _ in cand[key]],
                                [chunk_texts[ci] for _, ci in cand[key]],
                                [0.0] * len(cand[key]),
                                [qi for qi, _ in cand[key]])
                   for key in ("ev", "vb")}
        _bundles[lengths] = (pp, train_ds, cand_ds)
        return _bundles[lengths]

    for model_name in model_names:
        lengths = (12, 18) if model_name == "arcii" else (12, 32)
        pp, train_ds, cand_ds = bundle(lengths)
        preset_cfg, model_kwargs = get_preset(model_name)
        tr_cfg = dataclasses.replace(
            preset_cfg, epochs=epochs, batch_size=64, num_dup=1, num_neg=4,
            embedding_dim=embed_matrix.shape[1] if embed_matrix is not None
            else preset_cfg.embedding_dim,
            filter_low_freq=1, optimizer="adam", learning_rate=1e-3,
            fixed_length_left=lengths[0], fixed_length_right=lengths[1],
            eval_metrics=("map",),
        )
        t0 = time.perf_counter()
        trainer = RerankTrainer(model_name, vocab_size=pp.vocab_size,
                                cfg=tr_cfg, model_kwargs=model_kwargs,
                                embedding_matrix=embed_matrix)
        fit_res = trainer.fit(train_ds)
        preds = {key: trainer.predict(fit_res.params, cand_ds[key])
                 for key in ("ev", "vb")}

        # pure rescore on eval: candidates get reranker scores, tail below
        nq, nc = gen_scores["ev"].shape
        pure = np.full((nq, nc), -np.inf, np.float32)
        off = 0
        for qi in range(nq):
            order = np.argsort(-gen_scores["ev"][qi])
            c = order[:top]
            pure[qi, c] = preds["ev"][off: off + c.size]
            off += c.size
            tail = order[top:]
            lo = pure[qi, c].min()
            pure[qi, tail] = lo - 1.0 - np.arange(tail.size)
        res[f"hybrid_plus_{model_name}"] = ranking_metrics(
            doc_agg(pure, chunk_doc, n_docs), labels["ev"])

        # blend beta tuned on the DISJOINT vb split at doc level
        best = (0.0, -1.0)
        for beta in np.linspace(0.0, 1.0, 17):
            s = _blend_chunk_scores(gen_scores["vb"], preds["vb"], top,
                                    float(beta))
            m = ranking_metrics(doc_agg(s, chunk_doc, n_docs), labels["vb"],
                                metrics=("map",))["map"]
            if m > best[1]:
                best = (float(beta), m)
        blended = _blend_chunk_scores(gen_scores["ev"], preds["ev"], top,
                                      best[0])
        res[f"hybrid_plus_{model_name}_blend_tuned"] = ranking_metrics(
            doc_agg(blended, chunk_doc, n_docs), labels["ev"])
        res[f"rerank_beta_{model_name}"] = best[0]
        print(f"  [rerank {model_name}] pure "
              f"{res[f'hybrid_plus_{model_name}']['map']:.4f} "
              f"blend(beta={best[0]:.3f}) "
              f"{res[f'hybrid_plus_{model_name}_blend_tuned']['map']:.4f} "
              f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)
    return res
