"""Contrastive ENCODER training throughput: InfoNCE train steps/s on device.

The ROADMAP row "encoder contrastive training at scale on TPU": the quality
evals train CPU-sized encoders; this measures the production-class config
(the MiniLM-class encoder of the BASELINE encode rows) doing full InfoNCE
train steps — two transformer forwards + a (B, 2B) logit matmul + backward —
on the real chip. Steps chain through the params, so timing N dispatches +
one final scalar fetch measures true device throughput (no per-step tunnel
round-trip), same discipline as tools/bench_train.py.

ONE compiled program (the jitted step); tokenization is bypassed with
pre-made integer id batches so the row measures device compute, not host
text processing (host tokenization throughput has its own BASELINE row).
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--len-query", type=int, default=16)
    ap.add_argument("--len-chunk", type=int, default=128)
    ap.add_argument("--vocab", type=int, default=8192)
    ap.add_argument("--no-hard-negatives", action="store_true")
    ap.add_argument("--fit", action="store_true",
                    help="measure the real fit() path (host tokenization + "
                         "epoch loop + per-epoch loss flush) instead of the "
                         "raw jitted step — shows what the once-per-epoch "
                         "loss fetch buys on remote-attached devices")
    ap.add_argument("--fit-pairs", type=int, default=2048)
    ap.add_argument("--fit-epochs", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.models.encoder import SentenceEncoder
    from semanticsearch_tpu.train.encoder_train import (
        ContrastiveConfig,
        ContrastiveEncoderTrainer,
    )

    # the production encoder config of the BASELINE encode-throughput rows
    cfg = EncoderConfig(vocab_size=args.vocab, hidden_dim=384, num_layers=6,
                        num_heads=12, mlp_dim=1536, max_len=128)
    encoder = SentenceEncoder(cfg, seed=0)
    ccfg = ContrastiveConfig(
        batch_size=args.batch, max_len_query=args.len_query,
        max_len_chunk=args.len_chunk,
        use_hard_negatives=not args.no_hard_negatives,
    )
    if args.fit:
        # the REAL training path: texts -> tokenize -> epoch loop; epoch 0
        # pays the compile, later epochs are the steady-state rate
        fcfg = ContrastiveConfig(
            epochs=args.fit_epochs, batch_size=args.batch,
            max_len_query=args.len_query, max_len_chunk=args.len_chunk,
            use_hard_negatives=not args.no_hard_negatives, seed=0,
        )
        rng = np.random.default_rng(0)
        words = [f"w{i}" for i in range(4000)]
        pairs, negs = [], []
        for _ in range(args.fit_pairs):
            topic = rng.choice(words, size=10)
            pairs.append((" ".join(rng.choice(topic, 4)),
                          " ".join(rng.choice(topic, 24))))
            negs.append(" ".join(rng.choice(words, 24)))
        hist = ContrastiveEncoderTrainer(encoder, fcfg).fit(
            pairs, hard_negatives=None if args.no_hard_negatives else negs)
        steady = min(h["time_s"] for h in hist[1:]) if len(hist) > 1 \
            else hist[0]["time_s"]
        steps_per_epoch = -(-args.fit_pairs // args.batch)
        print(json.dumps({
            "metric": "encoder_train_fit_epoch",
            "steady_epoch_s": round(steady, 3),
            "steps_per_s": round(steps_per_epoch / steady, 3),
            "pairs_per_s": round(args.fit_pairs / steady, 1),
            "loss_first": round(hist[0]["loss"], 4),
            "loss_last": round(hist[-1]["loss"], 4),
            "batch_size": args.batch,
            "epochs": len(hist),
            "backend": jax.default_backend(),
        }))
        return

    trainer = ContrastiveEncoderTrainer(encoder, ccfg)
    trainer._build(total_steps=max(args.steps, 2))

    rng = np.random.default_rng(0)
    b = args.batch
    q_ids = jnp.asarray(rng.integers(3, args.vocab, (b, args.len_query)),
                        jnp.int32)
    q_mask = jnp.ones((b, args.len_query), jnp.int32)
    # chunk rows: positives, plus hard negatives appended when enabled
    c_rows = b if args.no_hard_negatives else 2 * b
    c_ids = jnp.asarray(rng.integers(3, args.vocab, (c_rows, args.len_chunk)),
                        jnp.int32)
    c_mask = jnp.ones((c_rows, args.len_chunk), jnp.int32)

    params = encoder.params
    opt_state = trainer._tx.init(params)
    key = jax.random.PRNGKey(1)

    # compile + warmup (scalar fetch forces completion through the tunnel)
    params, opt_state, loss = trainer._step_fn(
        params, opt_state, q_ids, q_mask, c_ids, c_mask, key)
    _ = float(loss)

    t0 = time.perf_counter()
    for _s in range(args.steps):
        params, opt_state, loss = trainer._step_fn(
            params, opt_state, q_ids, q_mask, c_ids, c_mask, key)
    _ = float(loss)
    dt = time.perf_counter() - t0

    # FLOP estimate: 6 * params_active * tokens (fwd+bwd) for the two
    # encoder towers; logit matmul is negligible at these shapes
    p_layer = 4 * 384 * 384 + 2 * 384 * 1536  # attn qkv/o + mlp up/down
    p_tot = cfg.num_layers * p_layer
    tokens = args.steps * (b * args.len_query + c_rows * args.len_chunk)
    flops = 6 * p_tot * tokens

    print(json.dumps({
        "metric": "encoder_train_steps_per_s",
        "steps_per_s": round(args.steps / dt, 3),
        "pairs_per_s": round(args.steps * b / dt, 1),
        "tokens_per_s": round(tokens / dt, 0),
        "model_tflops_per_s": round(flops / dt / 1e12, 2),
        "batch_size": b,
        "hard_negatives": not args.no_hard_negatives,
        "len_query": args.len_query,
        "len_chunk": args.len_chunk,
        "loss": float(loss),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
