"""Assemble the scale quality matrix (tools/eval_quality.py runs) into the
BASELINE.md table: per-method metrics as mean±std across seeds, the
hash-vs-subword tokenizer delta, and which rerankers beat their candidate
generator (reference claim surface: MatchZoo_Tool/evaluate_models.py:545-593).

Usage: python tools/quality_report.py [--dir bench_results] [--out -]
Reads  quality_scale_{variant}_s{N}.json  files (one JSON line each).
Variants: hash, subword (word-vocab rerankers), subword_rr (rerankers with
subword vocab + encoder-transfer embedding init + keep-best epoch selection).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

METRICS = ("map", "ndcg@10", "p@10", "mrr")


VARIANTS = ("hash", "subword", "subword_rr")


def load_runs(d):
    runs = defaultdict(dict)  # variant -> seed -> results
    for path in sorted(glob.glob(os.path.join(d, "quality_scale_*.json"))):
        m = re.search(r"quality_scale_(hash|subword|subword_rr)_s(\d+)\.json$",
                      path)
        if not m or os.path.getsize(path) == 0:
            continue
        with open(path) as f:
            obj = json.loads(f.read().strip())
        runs[m.group(1)][int(m.group(2))] = obj
    return runs


# The subword_rr recipe decomposed one ingredient at a time (all on the
# subword-tokenized corpus; same trained encoder, same hybrid candidates):
#   rung 0  word-vocab rerankers, random init, last epoch   (quality_scale_subword)
#   rung 1  + BPE piece vocab                               (abl_vocab)
#   rung 2  + encoder-transfer embedding init               (abl_vocab_init)
#   rung 3  + keep-best-epoch selection = full recipe       (quality_scale_subword_rr)
LADDER = (
    ("word vocab", "quality_scale_subword"),
    ("+piece vocab", "abl_vocab"),
    ("+encoder init", "abl_vocab_init"),
    ("+keep best", "quality_scale_subword_rr"),
)

# Encoder PRETRAINING recipe variants (all subword corpus, --rerankers none,
# same total contrastive epoch budget): unsupervised MLM denoising before
# the contrastive stage (train/mlm_pretrain.py) and/or ANCE-style
# hard-negative self-mining between stages (fit_with_mining).
PRETRAIN = (
    ("contrastive only", "wrrf_subword"),
    ("+MLM 3ep", "mlm3_subword"),
    ("+self-mining x2", "mine2_subword"),
    ("+MLM +mining", "mlm3_mine2_subword"),
)


def load_ladder(d, rungs_spec=LADDER):
    rungs = {}  # label -> seed -> results
    for label, stem in rungs_spec:
        per_seed = {}
        for path in sorted(glob.glob(os.path.join(d, f"{stem}_s*.json"))):
            m = re.search(r"_s(\d+)\.json$", path)
            if not m or os.path.getsize(path) == 0:
                continue
            with open(path) as f:
                per_seed[int(m.group(1))] = json.loads(f.read().strip())
        if per_seed:
            rungs[label] = per_seed
    return rungs


def agg(runs_for_tok, method, metric):
    vals = [r["results"][method][metric]
            for r in runs_for_tok.values() if method in r["results"]]
    if not vals:
        return None
    return float(np.mean(vals)), float(np.std(vals)), len(vals)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="bench_results")
    ap.add_argument("--out", default="-")
    args = ap.parse_args()
    runs = load_runs(args.dir)
    if not runs:
        print("no completed runs found", file=sys.stderr)
        return 1

    any_tok = next(v for v in VARIANTS if v in runs)
    some = next(iter(runs[any_tok].values()))
    methods = list(some["results"].keys())
    lines = []
    meta = some
    lines.append(
        f"Scale quality eval: {meta['topics']} topics, "
        f"{meta['eval_queries']} eval queries x {meta['eval_docs']} docs, "
        f"morphology-inflected splits (tools/eval_quality.py --scale)."
    )
    lines.append("")
    header = "| Method |"
    for tok in VARIANTS:
        if tok in runs:
            seeds = sorted(runs[tok])
            header += (f" {tok} MAP (seeds {seeds}) | {tok} nDCG@10 |")
    lines.append(header)
    lines.append("|---" * (header.count("|") - 1) + "|")
    for method in methods:
        row = f"| {method} |"
        for tok in VARIANTS:
            if tok not in runs:
                continue
            a = agg(runs[tok], method, "map")
            b = agg(runs[tok], method, "ndcg@10")
            row += (f" {a[0]:.4f}±{a[1]:.4f} |" if a else " — |")
            row += (f" {b[0]:.4f}±{b[1]:.4f} |" if b else " — |")
        lines.append(row)

    # tokenizer delta on the trained-encoder method (the claim under test)
    if "hash" in runs and "subword" in runs:
        lines.append("")
        for method in ("dense_trained_encoder", "hybrid_rrf"):
            h = agg(runs["hash"], method, "map")
            s = agg(runs["subword"], method, "map")
            if h and s:
                lines.append(
                    f"Subword-vs-hash MAP delta on {method}: "
                    f"{s[0]:.4f} vs {h[0]:.4f} "
                    f"({(s[0] - h[0]) / max(h[0], 1e-9) * 100:+.1f}%)."
                )

    # which rerankers beat their candidate generator (hybrid_rrf), per tok
    for tok in sorted(runs):
        base = agg(runs[tok], "hybrid_rrf", "map")
        if not base:
            continue
        beats, loses = [], []
        for method in methods:
            if not method.startswith("hybrid_plus_"):
                continue
            a = agg(runs[tok], method, "map")
            if a is None:
                continue
            (beats if a[0] > base[0] else loses).append(
                f"{method.removeprefix('hybrid_plus_')} ({a[0]:.3f})")
        lines.append("")
        lines.append(
            f"[{tok}] rerankers beating their hybrid candidate generator "
            f"(MAP {base[0]:.3f}): {', '.join(beats) or 'none'}; "
            f"not beating: {', '.join(loses) or 'none'}.")

    # recipe-attribution ladder: MAP per reranker at each rung
    ladder = load_ladder(args.dir)
    if len(ladder) >= 2:
        lines.append("")
        lines.append(
            "Recipe attribution (reranker MAP per ingredient, cumulative "
            "left to right; mean over available seeds):")
        labels = [lb for lb, _ in LADDER if lb in ladder]
        lines.append("| Reranker | " + " | ".join(
            f"{lb} (s{sorted(ladder[lb])})" for lb in labels) + " |")
        lines.append("|---" * (len(labels) + 1) + "|")
        rr = [m for m in methods if m.startswith("hybrid_plus_")]
        for method in rr:
            cells = []
            for lb in labels:
                a = agg(ladder[lb], method, "map")
                cells.append(f"{a[0]:.4f}" if a else "—")
            lines.append(
                f"| {method.removeprefix('hybrid_plus_')} | "
                + " | ".join(cells) + " |")

    # capstone: full best-known recipe (MLM + mining + tuned-fusion
    # candidates + all rerankers with the subword_rr ingredients)
    cap = load_ladder(args.dir, (("capstone", "best_recipe"),))
    if cap:
        per_seed = cap["capstone"]
        some_cap = next(iter(per_seed.values()))
        lines.append("")
        lines.append(
            f"Capstone (full recipe, seeds {sorted(per_seed)}): "
            "generator vs rerankers, MAP mean±std:")
        rows_ = [(m, agg(per_seed, m, "map"))
                 for m in some_cap["results"]
                 if m in ("hybrid_rrf", "hybrid_wrrf_tuned")
                 or m.startswith("hybrid_plus_")]
        for m, a in rows_:
            if a:
                lines.append(f"- {m}: {a[0]:.4f}±{a[1]:.4f}")

    # rerank-blend curve at the capstone recipe (ranking.rerank_blend):
    # per reranker, MAP at beta 0 (generator) .. 1 (pure reorder)
    bl = load_ladder(args.dir, (("blend", "best_recipe_blend"),))
    if bl:
        per_seed = bl["blend"]
        seeds = sorted(per_seed)
        gen = agg(per_seed, "hybrid_wrrf_tuned", "map")
        lines.append("")
        lines.append(
            f"Rerank-blend curve (capstone recipe, seeds {seeds}; "
            f"generator MAP {gen[0]:.4f}±{gen[1]:.4f}):")
        betas = ("0.25", "0.5", "0.75")
        lines.append("| Reranker | b=0.25 | b=0.5 | b=0.75 | pure (b=1) |")
        lines.append("|---|---|---|---|---|")
        some_bl = next(iter(per_seed.values()))
        for model in some_bl.get("rerank_blend_curve", {}):
            cells = []
            for b in betas:
                vals = [r["rerank_blend_curve"][model][b]["map"]
                        for r in per_seed.values()
                        if model in r.get("rerank_blend_curve", {})]
                cells.append(f"{np.mean(vals):.4f}±{np.std(vals):.4f}"
                             if vals else "—")
            pure = agg(per_seed, f"hybrid_plus_{model}", "map")
            cells.append(f"{pure[0]:.4f}±{pure[1]:.4f}" if pure else "—")
            lines.append(f"| {model} | " + " | ".join(cells) + " |")

    # VALIDATION-TUNED rerank blend (capstone_bt runs): the blend beta is
    # grid-searched per seed on the held-out validation split (fine 1/16
    # grid) and applied unchanged to eval — the honest answer to "can the
    # rerank stage add anything on top of the tuned generator?"
    # prefer the v2 runs (one consistent protocol: beta tuned on the fresh
    # seed+3000 split, disjoint from the alpha split)
    bt = (load_ladder(args.dir, (("bt", "capstone_bt2"),))
          or load_ladder(args.dir, (("bt", "capstone_bt"),)))
    if bt:
        per_seed = bt["bt"]
        seeds = sorted(per_seed)
        gen = agg(per_seed, "hybrid_wrrf_tuned", "map")
        lines.append("")
        lines.append(
            f"Validation-tuned rerank blend (capstone recipe, seeds {seeds}; "
            f"generator MAP {gen[0]:.4f}±{gen[1]:.4f}):")
        lines.append("| Reranker | tuned beta per seed | blend-tuned MAP "
                     "| blend-tuned nDCG@10 | pure (b=1) MAP |")
        lines.append("|---|---|---|---|---|")
        some_bt = next(iter(per_seed.values()))
        models = [m.removeprefix("hybrid_plus_").removesuffix("_blend_tuned")
                  for m in some_bt["results"] if m.endswith("_blend_tuned")]
        for model in models:
            key = f"hybrid_plus_{model}_blend_tuned"
            a = agg(per_seed, key, "map")
            b = agg(per_seed, key, "ndcg@10")
            pure = agg(per_seed, f"hybrid_plus_{model}", "map")
            betas = [
                str(per_seed[s].get("rerank_blend_curve", {})
                    .get(model, {}).get("tuned", {}).get("beta", "?"))
                for s in seeds
            ]
            lines.append(
                f"| {model} | {'/'.join(betas)} "
                + (f"| {a[0]:.4f}±{a[1]:.4f} " if a else "| — ")
                + (f"| {b[0]:.4f}±{b[1]:.4f} " if b else "| — ")
                + (f"| {pure[0]:.4f}±{pure[1]:.4f} |" if pure else "| — |"))

    # margin-MSE distillation probes (seed 0, capstone_bt_s0 as baseline)
    probes = sorted(glob.glob(os.path.join(args.dir, "distill_probe_*.json")))
    if probes:
        base = bt["bt"].get(0) if bt else None
        lines.append("")
        lines.append("Margin-MSE distillation probes (seed 0; pure-reranker "
                     "MAP, no-distill baseline in parens):")
        for path in probes:
            if os.path.getsize(path) == 0:
                continue
            with open(path) as f:
                obj = json.loads(f.read().strip())
            name = os.path.basename(path).removesuffix(".json")
            for m, r in obj["results"].items():
                if (m.startswith("hybrid_plus_")
                        and not m.endswith("_blend_tuned")):
                    model = m.removeprefix("hybrid_plus_")
                    b0 = (base["results"].get(m, {}).get("map")
                          if base else None)
                    lines.append(
                        f"- {name} {model}: {r['map']:.4f}"
                        + (f" (no-distill {b0:.4f})"
                           if b0 is not None else ""))

    # encoder pretraining recipe: dense + tuned-fusion MAP per variant
    pre = load_ladder(args.dir, PRETRAIN)
    if len(pre) >= 2:
        lines.append("")
        lines.append(
            "Encoder pretraining recipe (same contrastive epoch budget; "
            "mean±std over seeds):")
        lines.append("| Recipe | dense MAP | tuned-fusion MAP | seeds |")
        lines.append("|---|---|---|---|")
        for label, _stem in PRETRAIN:
            if label not in pre:
                continue
            cells = []
            for method in ("dense_trained_encoder", "hybrid_wrrf_tuned"):
                a = agg(pre[label], method, "map")
                cells.append(f"{a[0]:.4f}±{a[1]:.4f}" if a else "—")
            lines.append(f"| {label} | {cells[0]} | {cells[1]} "
                         f"| {sorted(pre[label])} |")

    # ---- round 4: chunking-method downstream A/B (tools/eval_chunking.py,
    # doc-level max-chunk scoring on the distribution-realistic corpus) ----
    def load_family(stem):
        per_seed = {}
        for path in sorted(glob.glob(os.path.join(args.dir,
                                                  f"{stem}_s*.json"))):
            m = re.search(rf"{stem}_s(\d+)\.json$", path)
            if not m or os.path.getsize(path) == 0:
                continue
            with open(path) as f:
                per_seed[int(m.group(1))] = json.loads(f.read().strip())
        return per_seed

    chunk_ab = load_family("chunk_ab")
    if chunk_ab:
        extras = {"char@1500": load_family("chunk_ab_charctl"),
                  "char@3000": load_family("chunk_ab_char3k"),
                  "splitter_dp": load_family("chunk_ab_dp"),
                  "grouping_modularity": load_family("chunk_ab_mod")}
        seeds = sorted(chunk_ab)
        lines.append("")
        lines.append(
            f"Chunking-method downstream A/B (doc-level MAP via max-chunk, "
            f"realistic corpus, seeds {seeds}; whole_doc = NO chunking):")
        lines.append("| Config | wrrf MAP | nDCG@10 | chunks | purity |")
        lines.append("|---|---|---|---|---|")

        def chunk_row(name, per_seed, cfg_key):
            maps = [r["results"][cfg_key]["hybrid_wrrf_tuned"]["map"]
                    for r in per_seed.values() if cfg_key in r["results"]]
            nd_ = [r["results"][cfg_key]["hybrid_wrrf_tuned"]["ndcg@10"]
                   for r in per_seed.values() if cfg_key in r["results"]]
            if not maps:
                return
            nch = np.mean([r["results"][cfg_key]["n_chunks"]
                           for r in per_seed.values()
                           if cfg_key in r["results"]])
            pur = [r["results"][cfg_key].get("purity")
                   for r in per_seed.values() if cfg_key in r["results"]]
            pur = [p for p in pur if p is not None]
            lines.append(
                f"| {name} | {np.mean(maps):.4f}±{np.std(maps):.4f} "
                f"| {np.mean(nd_):.4f}±{np.std(nd_):.4f} | {nch:.0f} "
                f"| {np.mean(pur):.3f} |" if pur else
                f"| {name} | {np.mean(maps):.4f}±{np.std(maps):.4f} "
                f"| {np.mean(nd_):.4f}±{np.std(nd_):.4f} | {nch:.0f} | — |")

        some = next(iter(chunk_ab.values()))
        for cfg_key in some["results"]:
            chunk_row(cfg_key, chunk_ab, cfg_key)
        for label, fam in extras.items():
            if fam:
                some_e = next(iter(fam.values()))
                for cfg_key in some_e["results"]:
                    if (cfg_key.startswith("char_") or cfg_key in
                            ("semantic_splitter_dp",
                             "semantic_grouping_modularity")):
                        chunk_row(label, fam, cfg_key)

        hash_ab = load_family("chunk_ab_hash")
        if hash_ab:
            lines.append("")
            lines.append("Subword-vs-hash on the realistic corpus "
                         "(dense MAP per config):")
            for cfg_key in some["results"]:
                sub = [r["results"][cfg_key]["dense_trained"]["map"]
                       for r in chunk_ab.values()
                       if cfg_key in r["results"]]
                ha = [r["results"][cfg_key]["dense_trained"]["map"]
                      for r in hash_ab.values() if cfg_key in r["results"]]
                if sub and ha:
                    lines.append(
                        f"- {cfg_key}: subword {np.mean(sub):.4f} vs hash "
                        f"{np.mean(ha):.4f} "
                        f"({(np.mean(sub) - np.mean(ha)) / max(np.mean(ha), 1e-9) * 100:+.1f}%)")

    # ---- round 5: unified capstone x chunking x realistic-corpus headline
    # (VERDICT-r4 item 1: the flagship quality table, eval_chunking.py
    # --recipe capstone at the best semantic configs + char@1000 control)
    cap = load_family("capstone_chunk")
    if cap:
        seeds = sorted(cap)
        lines.append("")
        lines.append(
            f"UNIFIED HEADLINE — capstone recipe (MLM+mining+subword+tuned "
            f"fusion/blend) x chunking config x realistic corpus "
            f"(doc-level MAP, seeds {seeds}):")
        lines.append("| Chunking config | method | MAP | nDCG@10 |")
        lines.append("|---|---|---|---|")
        some_c = next(iter(cap.values()))
        for cfg_key in some_c["results"]:
            res0 = some_c["results"][cfg_key]
            methods = [k for k in (
                "bm25_only", "dense_trained", "hybrid_wrrf_tuned")
                if k in res0]
            methods += sorted(k for k in res0 if k.startswith("hybrid_plus_"))
            for method in methods:
                maps, nds, betas = [], [], []
                for r in cap.values():
                    rr = r["results"].get(cfg_key, {})
                    if method in rr:
                        maps.append(rr[method]["map"])
                        nds.append(rr[method]["ndcg@10"])
                        bkey = "rerank_beta_" + method.replace(
                            "hybrid_plus_", "").replace("_blend_tuned", "")
                        if method.endswith("_blend_tuned") and bkey in rr:
                            betas.append(rr[bkey])
                if not maps:
                    continue
                label = method + (
                    f" (beta {'/'.join(f'{b:.3g}' for b in betas)})"
                    if betas else "")
                lines.append(
                    f"| {cfg_key} | {label} "
                    f"| {np.mean(maps):.4f}±{np.std(maps):.4f} "
                    f"| {np.mean(nds):.4f}±{np.std(nds):.4f} |")

    # ---- round 5: high-granularity semantic frontier (VERDICT-r4 item 2)
    gran = load_family("gran_frontier")
    if gran and chunk_ab:  # chunk_row is defined under the chunk_ab family
        seeds = sorted(gran)
        lines.append("")
        lines.append(
            f"High-granularity chunking frontier (semantic configs swept "
            f"to the char operating points; doc-level wrrf MAP, "
            f"seeds {seeds}):")
        lines.append("| Config | wrrf MAP | nDCG@10 | chunks | purity |")
        lines.append("|---|---|---|---|---|")
        some_g = next(iter(gran.values()))
        order = sorted(
            some_g["results"],
            key=lambda k2: np.mean([r["results"][k2]["n_chunks"]
                                    for r in gran.values()
                                    if k2 in r["results"]]))
        for cfg_key in order:
            chunk_row(cfg_key, gran, cfg_key)

    # ---- round 4: OIE quality (gold P/R/F1 + enrichment A/B) ----
    gold_path = os.path.join(args.dir, "oie_gold.json")
    if os.path.exists(gold_path) and os.path.getsize(gold_path):
        with open(gold_path) as f:
            gold = json.loads(f.read().strip())
        lines.append("")
        lines.append(f"OIE triple-level P/R/F1 vs the {gold['n_sentences']}"
                     "-sentence hand-labeled gold set "
                     "(tools/eval_oie_gold.py, token-overlap >= "
                     f"{gold['thr']}):")
        for eng, r in gold["results"].items():
            lines.append(f"- {eng}: P {r['precision']:.3f} / R "
                         f"{r['recall']:.3f} / F1 {r['f1']:.3f} "
                         f"(exact {r['exact_rate']:.3f})")

    enrich = load_family("oie_enrich")
    if enrich:
        seeds = sorted(enrich)
        lines.append("")
        lines.append(f"OIE enrichment A/B (raw_oie_data_plus_chunk_text vs "
                     f"plain chunk_text, seeds {seeds}):")
        lines.append("| Representation | BM25 MAP | dense MAP | hybrid MAP |")
        lines.append("|---|---|---|---|")
        some_e = next(iter(enrich.values()))
        for rep in some_e["results"]:
            cells = []
            for leg in ("bm25_only", "dense_trained", "hybrid_rrf"):
                vals = [r["results"][rep][leg]["map"]
                        for r in enrich.values() if rep in r["results"]]
                cells.append(f"{np.mean(vals):.4f}±{np.std(vals):.4f}")
            lines.append(f"| {rep} | " + " | ".join(cells) + " |")

    # ---- round 4: cross-encoder scale rows (ce_scale_s*.json) ----
    ce = load_family("ce_scale")
    if ce:
        seeds = sorted(ce)
        gen = agg(ce, "hybrid_wrrf_tuned", "map")
        pure = agg(ce, "hybrid_plus_cross_encoder", "map")
        bl_ = agg(ce, "hybrid_plus_cross_encoder_blend_tuned", "map")
        lines.append("")
        lines.append(
            f"Cross-encoder at SCALE (200 topics, encoder_full warm start, "
            f"12 epochs, seeds {seeds}): generator "
            + (f"{gen[0]:.4f}±{gen[1]:.4f}" if gen else "—")
            + ", pure rescore "
            + (f"{pure[0]:.4f}±{pure[1]:.4f}" if pure else "—")
            + ", blend-tuned "
            + (f"{bl_[0]:.4f}±{bl_[1]:.4f}" if bl_ else "—") + ".")

    text = "\n".join(lines)
    if args.out == "-":
        print(text)
    else:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
