"""Contrastive encoder-training throughput: steps/s and pairs/s on device.

The reference has no encoder training at all (it downloads pretrained
sentence-transformers weights); this measures the in-repo InfoNCE loop
(train/encoder_train.py) that replaces them.
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    import jax

    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.models.encoder import SentenceEncoder
    from semanticsearch_tpu.train.encoder_train import (
        ContrastiveConfig, ContrastiveEncoderTrainer,
    )

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        args.pairs = min(args.pairs, 256)

    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(5000)]
    pairs = []
    negs = []
    for _ in range(args.pairs):
        topic = rng.choice(vocab, size=8)
        pairs.append((
            " ".join(rng.choice(topic, size=4)),
            " ".join(rng.choice(topic, size=12)),
        ))
        negs.append(" ".join(rng.choice(vocab, size=12)))

    enc = SentenceEncoder(EncoderConfig(
        dtype="bfloat16" if on_tpu else "float32",
    ))
    cfg = ContrastiveConfig(
        epochs=args.epochs, batch_size=args.batch,
        max_len_query=64, max_len_chunk=128, seed=0,
    )
    trainer = ContrastiveEncoderTrainer(enc, cfg)
    history = trainer.fit(pairs, hard_negatives=negs)

    # first epoch pays compile; report the best later epoch
    steps_per_epoch = -(-args.pairs // args.batch)
    best = min(h["time_s"] for h in history[1:]) if len(history) > 1 else (
        history[0]["time_s"]
    )
    print(json.dumps({
        "metric": "contrastive_encoder_train",
        "steps_per_sec": round(steps_per_epoch / best, 2),
        "pairs_per_sec": round(args.pairs / best, 1),
        "loss_first": round(history[0]["loss"], 4),
        "loss_last": round(history[-1]["loss"], 4),
        "batch": args.batch,
        "epochs": len(history),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
