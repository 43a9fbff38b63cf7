"""Triple-level P/R/F1 of the OIE engines against a hand-labeled gold set.

VERDICT-r3 item 4b: the heuristic and neural extractors
(``oie/heuristic.py``, ``oie/neural.py``) are measured against
``tests/fixtures/oie_gold.jsonl`` — ~100 hand-written English sentences with
gold {subject, relation, object} triples (including aux chains, particles,
relative clauses, negation, multi-clause coordination, and no-triple
fragments). The reference never measures its OpenIE5 sidecar either
(``Tool/OIE.py:285-390`` trusts the server's output); this produces the
missing number for the in-repo engines.

Matching rule (CaRB-style token overlap, simplified and documented): a
predicted triple matches a gold triple when the mean over the three slots of
token-level F1 (lowercased, punctuation-stripped) is >= 0.6; predictions and
golds match one-to-one greedily by descending score. Precision = matched
predictions / all predictions, Recall = matched golds / all golds.

The neural engine is trained from HEURISTIC silver labels on a disjoint
template corpus (never on the gold sentences), so its score measures both
what it inherited from the teacher and where it generalizes differently.

Usage: python tools/eval_oie_gold.py [--neural-epochs 12]
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

GOLD_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "oie_gold.jsonl")


def _toks(s):
    return [w.strip(".,").lower() for w in s.split() if w.strip(".,")]


def slot_f1(pred, gold):
    p, g = _toks(pred), _toks(gold)
    if not p and not g:
        return 1.0
    if not p or not g:
        return 0.0
    from collections import Counter

    overlap = sum((Counter(p) & Counter(g)).values())
    if overlap == 0:
        return 0.0
    prec, rec = overlap / len(p), overlap / len(g)
    return 2 * prec * rec / (prec + rec)


def triple_score(pred, gold):
    return np.mean([slot_f1(pred[k], gold[k])
                    for k in ("subject", "relation", "object")])


def score_engine(extract_fn, gold_rows, thr=0.6):
    n_pred = n_gold = n_match = n_exact = 0
    per_sentence = []
    for row in gold_rows:
        preds = extract_fn(row["text"])
        golds = row["triples"]
        n_pred += len(preds)
        n_gold += len(golds)
        scored = sorted(
            ((triple_score(p, g), pi, gi)
             for pi, p in enumerate(preds) for gi, g in enumerate(golds)),
            reverse=True)
        used_p, used_g = set(), set()
        matches = 0
        for s, pi, gi in scored:
            if s < thr or pi in used_p or gi in used_g:
                continue
            used_p.add(pi)
            used_g.add(gi)
            matches += 1
            if s >= 0.999:
                n_exact += 1
        n_match += matches
        per_sentence.append((row["text"], len(preds), len(golds), matches))
    prec = n_match / n_pred if n_pred else 1.0
    rec = n_match / n_gold if n_gold else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": round(prec, 4), "recall": round(rec, 4),
            "f1": round(f1, 4), "exact_rate": round(n_exact / n_gold, 4)
            if n_gold else 1.0, "n_pred": n_pred, "n_gold": n_gold,
            "n_match": n_match}, per_sentence


def neural_train_corpus(n=1200, seed=0):
    """Template English DISJOINT from the gold sentences (no gold sentence
    is generated; sharing common English words is normal corpus overlap):
    silver labels come from the heuristic teacher. Structures mirror the
    gold categories — simple SVO, auxiliary chains, particle verbs,
    passives, negation, plural -s verbs, and triple-less fragments — so the
    student's gold score measures teacher inheritance, not template
    memorization."""
    rng = np.random.default_rng(seed)
    adjs = ["old", "young", "famous", "local", "senior", "retired", "new",
            "quiet", "modern", "rural", "coastal", "ancient", "regional",
            "damaged", "national", "eastern"]
    subs = ["engineer", "farmer", "pilot", "teacher", "mayor", "doctor",
            "agency", "board", "crew", "guild", "institute", "village",
            "committee", "ministry", "workshop", "union", "company",
            "museum", "council", "foundry", "port", "academy"]
    verbs = ["carried", "approved", "built", "painted", "visited", "signed",
             "repaired", "planted", "produced", "required", "provided",
             "delivered", "examined", "organized", "restored", "mapped",
             "rejected", "announced", "measured", "designed", "recorded",
             "completed", "published", "guided", "funded", "tracked"]
    sverbs = ["produces", "requires", "provides", "delivers", "sells",
              "offers", "attracts", "publishes", "stores", "exports",
              "measures", "funds", "tracks", "builds", "knows"]
    objs = ["bridge", "budget", "house", "letter", "garden", "contract",
            "engine", "orchard", "archive", "harbor", "tunnel", "granary",
            "report", "statue", "canal", "railway", "library", "festival",
            "program", "survey", "pavilion", "warehouse"]
    pps = ["", " in the valley", " before noon", " for two years",
           " near the coast", " with great care", " on Friday",
           " across the region", " after the storm", " by hand"]
    particles = ["invested in", "relied on", "focused on", "voted for",
                 "sailed from"]
    out = []
    for _ in range(n):
        r = rng.random()
        adj, sub = rng.choice(adjs), rng.choice(subs)
        obj, pp = rng.choice(objs), rng.choice(pps)
        if r < 0.35:       # simple SVO, past tense
            out.append(f"The {adj} {sub} {rng.choice(verbs)} "
                       f"the {obj}{pp}.")
        elif r < 0.5:      # plural/singular present -s
            out.append(f"The {sub} {rng.choice(sverbs)} "
                       f"the {obj}{pp}.")
        elif r < 0.62:     # auxiliary chain
            aux = rng.choice(["has", "had", "will have", "has been",
                              "was", "is being"])
            out.append(f"The {adj} {sub} {aux} {rng.choice(verbs)}"
                       f"{pp if pp else ' the ' + obj}.")
        elif r < 0.72:     # particle verb
            out.append(f"The {sub} {rng.choice(particles)} "
                       f"the {obj}{pp}.")
        elif r < 0.8:      # negation
            neg = rng.choice(["did not", "does not", "could not"])
            out.append(f"The {sub} {neg} {rng.choice(verbs)} "
                       f"the {obj}.")
        elif r < 0.92:     # longer subject / two adjectives
            out.append(f"The {adj} {rng.choice(adjs)} {sub} "
                       f"{rng.choice(verbs)} the {obj}{pp}.")
        else:              # fragment, no triple
            out.append(f"The {adj} {obj}{pp}.")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--neural-epochs", type=int, default=12)
    ap.add_argument("--thr", type=float, default=0.6)
    ap.add_argument("--skip-neural", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from semanticsearch_tpu.oie.heuristic import extract_triples_heuristic

    gold_rows = [json.loads(line) for line in open(GOLD_PATH)]
    print(f"[gold] {len(gold_rows)} sentences, "
          f"{sum(len(r['triples']) for r in gold_rows)} gold triples",
          file=sys.stderr)

    results = {}
    t0 = time.perf_counter()
    results["heuristic"], _ = score_engine(
        extract_triples_heuristic, gold_rows, thr=args.thr)
    print(f"[heuristic] {results['heuristic']} "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)

    if not args.skip_neural:
        from semanticsearch_tpu.oie.neural import (
            NeuralOIEConfig, train_neural_oie,
        )

        t0 = time.perf_counter()
        cfg = NeuralOIEConfig(hidden_dim=64, num_layers=2, num_heads=4,
                              mlp_dim=128, max_len=48, max_words=24,
                              vocab_size=1024, epochs=args.neural_epochs,
                              batch_size=32, seed=0)
        oie = train_neural_oie(neural_train_corpus(), cfg=cfg,
                               bpe_vocab_size=1024)
        print(f"[neural] trained ({time.perf_counter()-t0:.0f}s)",
              file=sys.stderr)
        results["neural_cross_domain"], _ = score_engine(
            lambda t: oie.extract([t])[0], gold_rows, thr=args.thr)
        # the extract-time self-check (r5, VERDICT-r4 item 5): does the
        # deployment gate PREDICT this F1 collapse? Teacher agreement on
        # the target corpus should sit far below the 0.5 floor here.
        results["neural_cross_domain"]["teacher_agreement"] = round(
            oie.teacher_agreement([r["text"] for r in gold_rows],
                                  sample=104)["agreement"], 4)
        print(f"[neural cross-domain] {results['neural_cross_domain']}",
              file=sys.stderr)

        # The DEPLOYMENT recipe (`semsearch oie-train`) fits the tagger on
        # the user's own corpus text — silver labels from the heuristic,
        # gold labels never seen — then extracts on that corpus. Measure
        # that configuration: fit on the gold sentences' raw text plus the
        # template corpus (the tiny gold text alone underfits).
        t0 = time.perf_counter()
        oie_in = train_neural_oie(
            [r["text"] for r in gold_rows] * 6 + neural_train_corpus(600),
            cfg=cfg, bpe_vocab_size=1024)
        print(f"[neural in-domain] trained ({time.perf_counter()-t0:.0f}s)",
              file=sys.stderr)
        results["neural_in_domain_fit"], _ = score_engine(
            lambda t: oie_in.extract([t])[0], gold_rows, thr=args.thr)
        # and the in-domain fit should clear the floor comfortably
        results["neural_in_domain_fit"]["teacher_agreement"] = round(
            oie_in.teacher_agreement([r["text"] for r in gold_rows],
                                     sample=104)["agreement"], 4)
        print(f"[neural in-domain] {results['neural_in_domain_fit']}",
              file=sys.stderr)

    print(json.dumps({"metric": "oie_gold_prf", "thr": args.thr,
                      "n_sentences": len(gold_rows), "results": results}))
    md = ["| engine | P | R | F1 | exact |", "|---|---|---|---|---|"]
    for name, r in results.items():
        md.append(f"| {name} | {r['precision']:.3f} | {r['recall']:.3f} "
                  f"| {r['f1']:.3f} | {r['exact_rate']:.3f} |")
    print("\n".join(md), file=sys.stderr)


if __name__ == "__main__":
    main()
