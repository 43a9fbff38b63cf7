"""OIE enrichment throughput: heuristic (host) vs neural tagger (device).

The reference's extractor is one HTTP call per paragraph against a Java
OpenIE5 server (``Tool/OIE.py:200-249``; typical single-digit paragraphs/s
and an 8 s per-call timeout). The rebuild's two in-repo extractors:

- ``oie/heuristic.py``: rule-based SVO, pure host Python;
- ``oie/neural.py``: BIO tagger — hundreds of sentences per fixed-shape
  jitted forward (the TPU-native shape of this workload, SURVEY §2).

This bench trains the tagger on a silver corpus (few minutes through the
tunnel; production trains once and serves the checkpoint), then times both
extractors on the same fresh sentences. Stages go to stderr; stdout is one
JSON line. Tunnel discipline (CLAUDE.md): big batches, one fetch per batch,
two compiled programs total (train step + tag step).

Usage: python tools/bench_oie.py [--sentences 8192] [--batch 1024]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def make_sentences(n, seed=0):
    rng = np.random.default_rng(seed)
    adjs = ["old", "young", "tired", "famous", "local", "senior", "retired",
            "angry", "quiet", "clever"]
    subs = ["engineer", "farmer", "pilot", "teacher", "mayor", "doctor",
            "painter", "driver", "lawyer", "sailor"]
    verbs = ["carried", "approved", "built", "painted", "visited",
             "repaired", "signed", "planted", "measured", "reported",
             "inspected", "delivered"]
    objs = ["bridge", "budget", "house", "letter", "garden", "engine",
            "contract", "orchard", "report", "harbor", "ledger", "mural"]
    fillers = ["yesterday", "last week", "in the morning", "after the storm",
               "near the station", "without delay"]
    out = []
    for _ in range(n):
        kind = rng.random()
        if kind < 0.85:
            out.append(
                f"The {rng.choice(adjs)} {rng.choice(subs)} "
                f"{rng.choice(verbs)} the {rng.choice(objs)} "
                f"{rng.choice(fillers)}.")
        else:  # no-triple filler the extractors should stay silent on
            out.append(f"Quiet {rng.choice(objs)} {rng.choice(fillers)}.")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sentences", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--train-sentences", type=int, default=768)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--model-dir", default=None,
                    help="reuse a trained NeuralOIE checkpoint (skips the "
                         "silver bootstrap)")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="pin the JAX platform (config.update AFTER import "
                         "— the env var alone loses to the axon plugin)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from semanticsearch_tpu.oie.heuristic import extract_triples_heuristic
    from semanticsearch_tpu.oie.neural import (
        NeuralOIE, NeuralOIEConfig, train_neural_oie,
    )

    backend = jax.default_backend()
    texts = make_sentences(args.sentences, seed=7)

    # ------------------------------------------------ heuristic (host) leg
    print("STAGE heuristic...", file=sys.stderr)
    t0 = time.perf_counter()
    heur = [extract_triples_heuristic(t) for t in texts]
    t_heur = time.perf_counter() - t0
    heur_rate = len(texts) / t_heur
    print(f"STAGE heuristic done: {heur_rate:.0f} sent/s "
          f"({sum(map(len, heur))} triples)", file=sys.stderr)

    # ----------------------------------------------------- neural (device)
    if args.model_dir and os.path.isdir(args.model_dir):
        oie = NeuralOIE.load(args.model_dir)
        print(f"STAGE loaded tagger from {args.model_dir}", file=sys.stderr)
    else:
        print("STAGE silver bootstrap...", file=sys.stderr)
        t0 = time.perf_counter()
        oie = train_neural_oie(
            make_sentences(args.train_sentences, seed=1),
            cfg=NeuralOIEConfig(epochs=args.epochs,
                                dtype="bfloat16" if backend == "tpu"
                                else "float32"),
            save_dir=args.model_dir,
        )
        print(f"STAGE bootstrap done ({time.perf_counter()-t0:.1f}s)",
              file=sys.stderr)

    # warmup compiles the single tag signature
    oie.extract(texts[: args.batch], batch_size=args.batch)
    print("STAGE warmup done", file=sys.stderr)
    t0 = time.perf_counter()
    neural = oie.extract(texts, batch_size=args.batch)
    t_neural = time.perf_counter() - t0
    neural_rate = len(texts) / t_neural

    # agreement with the teacher on triple-bearing sentences (sanity: the
    # student should reproduce most of what it distilled)
    hit = tot = 0
    for h, nn_ in zip(heur, neural):
        if not h:
            continue
        tot += 1
        hit += bool(nn_) and nn_[0] == h[0]
    agreement = hit / max(1, tot)
    print(f"STAGE neural done: {neural_rate:.0f} sent/s, "
          f"teacher agreement {agreement:.3f}", file=sys.stderr)

    print(json.dumps({
        "metric": "oie_sentences_per_s",
        "value": round(neural_rate, 1),
        "unit": "sent/s",
        "heuristic_host_sent_per_s": round(heur_rate, 1),
        "neural_device_sent_per_s": round(neural_rate, 1),
        "teacher_agreement": round(agreement, 4),
        "backend": backend,
        "sentences": len(texts),
        "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
